package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** OTLP/protobuf source: decodes the binary wire format of
  * ExportTraceServiceRequest / ExportLogsServiceRequest /
  * ExportMetricsServiceRequest into the SAME nested batch contract
  * [[OtelJsonSource]] emits, so [[graft.otel.OtelTraces.flatten]] /
  * [[graft.otel.OtelLogs.flatten]] / [[graft.otel.OtelMetrics]]
  * consume either encoding interchangeably — closing the drop-in
  * ingestion gap with the reference, whose collector feeds it pdata
  * batches deserialized from this exact wire format
  * (`/root/reference/exporter.go:1-120` consumes ptrace/plog/pmetric).
  *
  * No protobuf library exists in this environment, so this is a
  * minimal proto3 WIRE decoder (varint / fixed64 / fixed32 /
  * length-delimited, unknown fields skipped for forward compatibility)
  * with the public opentelemetry-proto field numbers hard-wired per
  * message. Scale shape: `binaryFile` files decode independently on
  * executors (one task per file — OTLP requests are collector-batch
  * sized, parallelism comes from file count), and the decoded rows
  * carry straight into the flattens' columnar pipeline; nothing
  * touches the driver.
  */
object OtelProtoSource {

  // ---- wire reader -----------------------------------------------------

  /** Cursor over one length-delimited scope of `buf`. Proto3 wire types:
    * 0 varint, 1 fixed64, 2 length-delimited, 5 fixed32. */
  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end

    // Every read is bounds-checked against THIS scope's end (r6 —
    // unchecked reads trusted decoded lengths, so truncated or corrupt
    // input could read past a sub-message into sibling bytes — silently
    // wrong rows — throw a raw ArrayIndexOutOfBounds, or, with a length
    // that overflowed to a negative Int, move pos BACKWARDS and spin an
    // executor forever). Malformed input now fails loudly and cheaply.
    private def need(n: Int): Unit =
      if (n < 0 || n > end - pos)
        throw new IllegalArgumentException(
          s"malformed protobuf: need $n bytes at $pos of $end")

    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        need(1)
        val b = buf(pos)
        pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }

    /** Length prefix: non-negative and within this scope. */
    private def readLen(): Int = {
      val len = readVarint()
      if (len < 0 || len > end - pos)
        throw new IllegalArgumentException(
          s"malformed protobuf: length $len at $pos of $end")
      len.toInt
    }

    def readFixed64(): Long = {
      need(8)
      var out = 0L
      var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }

    def readFixed32(): Int = {
      need(4)
      var out = 0
      var i = 0
      while (i < 4) { out |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4
      out
    }

    def readDouble(): Double = java.lang.Double.longBitsToDouble(readFixed64())

    /** Sub-reader over the next length-delimited value. */
    def readMessage(): Reader = {
      val len = readLen()
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }

    def readString(): String = {
      val len = readLen()
      val s = new String(buf, pos, len, "UTF-8")
      pos += len
      s
    }

    def readBytesHex(): String = {
      val len = readLen()
      val sb = new java.lang.StringBuilder(len * 2)
      var i = 0
      while (i < len) {
        val v = buf(pos + i) & 0xff
        sb.append(Character.forDigit(v >>> 4, 16))
        sb.append(Character.forDigit(v & 0xf, 16))
        i += 1
      }
      pos += len
      sb.toString
    }

    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => need(8); pos += 8
      case 2 =>
        // read the length BEFORE touching pos: `pos += readVarint()`
        // evaluates the old pos first, silently dropping the length
        // byte's own advancement (caught by the field-order fuzz test)
        val len = readLen()
        pos += len
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def zigzag32(n: Long): Int = (((n >>> 1) ^ -(n & 1)).toInt)

  /** Packed-or-not repeated scalar: wire 2 is the packed block, the
    * scalar wire type is the unpacked single element. */
  private def repeatedLongs(r: Reader, wire: Int, packedElem: Reader => Long,
                            out: scala.collection.mutable.ArrayBuffer[Long]): Unit =
    if (wire == 2) { val m = r.readMessage(); while (m.hasMore) out += packedElem(m) }
    else out += packedElem(r)

  // ---- decoded batch contract (mirrors OtelJsonSource output) ----------

  case class PbResource(attributes: Map[String, String],
                        dropped_attributes_count: Int)
  case class PbScope(name: String, version: String,
                     attributes: Map[String, String],
                     dropped_attributes_count: Int)
  case class PbEvent(time_unix_nano: Long, name: String,
                     attributes: Map[String, String],
                     dropped_attributes_count: Int)
  case class PbLink(trace_id: String, span_id: String, trace_state: String,
                    attributes: Map[String, String],
                    dropped_attributes_count: Int, flags: Int)
  case class PbStatus(code: Int, message: String)
  case class PbSpan(trace_id: String, span_id: String, trace_state: String,
                    parent_span_id: String, flags: Int, name: String, kind: Int,
                    start_time_unix_nano: Long, end_time_unix_nano: Long,
                    attributes: Map[String, String],
                    dropped_attributes_count: Int,
                    events: Seq[PbEvent], dropped_events_count: Int,
                    links: Seq[PbLink], dropped_links_count: Int,
                    status: PbStatus)
  case class PbTraceBatch(resource: PbResource, scope: PbScope,
                          spans: Seq[PbSpan])

  case class PbLogRecord(time_unix_nano: Long, observed_time_unix_nano: Long,
                         severity_number: Int, severity_text: String,
                         body: String, attributes: Map[String, String],
                         dropped_attributes_count: Int, flags: Int,
                         trace_id: String, span_id: String, event_name: String)
  case class PbLogBatch(resource: PbResource, scope: PbScope,
                        records: Seq[PbLogRecord])

  case class PbMetricInfo(name: String, description: String, unit: String,
                          metadata: Map[String, String],
                          aggregation_temporality: Int, is_monotonic: Boolean)
  case class PbExemplar(time_unix_nano: Long, as_double: Option[Double],
                        as_int: Option[Long], span_id: String, trace_id: String,
                        filtered_attributes: Map[String, String])
  case class PbNumPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                        attributes: Map[String, String], flags: Int,
                        as_double: Option[Double], as_int: Option[Long],
                        exemplars: Seq[PbExemplar])
  case class PbNumBatch(resource: PbResource, scope: PbScope,
                        metric: PbMetricInfo, points: Seq[PbNumPoint])
  case class PbHistPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                         attributes: Map[String, String], flags: Int,
                         count: Long, sum: Option[Double], min: Option[Double],
                         max: Option[Double], bucket_counts: Seq[Long],
                         explicit_bounds: Seq[Double],
                         exemplars: Seq[PbExemplar])
  case class PbHistBatch(resource: PbResource, scope: PbScope,
                         metric: PbMetricInfo, points: Seq[PbHistPoint])
  case class PbBuckets(offset: Int, bucket_counts: Seq[Long])
  case class PbExpHistPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                            attributes: Map[String, String], flags: Int,
                            count: Long, sum: Option[Double],
                            min: Option[Double], max: Option[Double],
                            scale: Int, zero_count: Long,
                            zero_threshold: Double, positive: PbBuckets,
                            negative: PbBuckets, exemplars: Seq[PbExemplar])
  case class PbExpHistBatch(resource: PbResource, scope: PbScope,
                            metric: PbMetricInfo, points: Seq[PbExpHistPoint])
  case class PbQuantile(quantile: Double, value: Double)
  case class PbSummaryPoint(time_unix_nano: Long, start_time_unix_nano: Long,
                            attributes: Map[String, String], flags: Int,
                            count: Long, sum: Double,
                            quantile_values: Seq[PbQuantile])
  case class PbSummaryBatch(resource: PbResource, scope: PbScope,
                            metric: PbMetricInfo, points: Seq[PbSummaryPoint])

  // ---- common message decoders -----------------------------------------

  /** AnyValue → the JSON source's scalar string render (stringValue |
    * intValue | doubleValue | boolValue, as strings); non-scalar values
    * (array/kvlist/bytes) render as null, matching the JSON schema that
    * simply has no slot for them. */
  private def decodeAnyValue(r: Reader): Option[String] = {
    var out: Option[String] = None
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => out = Some(r.readString())
        case (2, 0) => out = Some(String.valueOf(r.readVarint() != 0L))
        case (3, 0) => out = Some(String.valueOf(r.readVarint()))
        case (4, 1) => out = Some(String.valueOf(r.readDouble()))
        case (_, w) => out = None; r.skip(w) // array/kvlist/bytes
      }
    }
    out
  }

  private def decodeAttrs(r: Reader,
                          out: scala.collection.mutable.LinkedHashMap[String, String]): Unit = {
    // KeyValue { key = 1; value = 2 }
    var key = ""
    var value: Option[String] = None
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => key = r.readString()
        case (2, 2) => value = decodeAnyValue(r.readMessage())
        case (_, w) => r.skip(w)
      }
    }
    out(key) = value.orNull
  }

  private def decodeResource(r: Reader): PbResource = {
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var dropped = 0
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => decodeAttrs(r.readMessage(), attrs)
        case (2, 0) => dropped = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
    }
    PbResource(attrs.toMap, dropped)
  }

  private def decodeScope(r: Reader): PbScope = {
    var name = ""; var version = ""
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var dropped = 0
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => name = r.readString()
        case (2, 2) => version = r.readString()
        case (3, 2) => decodeAttrs(r.readMessage(), attrs)
        case (4, 0) => dropped = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
    }
    PbScope(name, version, attrs.toMap, dropped)
  }

  // ---- traces ----------------------------------------------------------

  private def decodeSpanEvent(r: Reader): PbEvent = {
    var t = 0L; var name = ""
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var dropped = 0
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 1) => t = r.readFixed64()
        case (2, 2) => name = r.readString()
        case (3, 2) => decodeAttrs(r.readMessage(), attrs)
        case (4, 0) => dropped = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
    }
    PbEvent(t, name, attrs.toMap, dropped)
  }

  private def decodeSpanLink(r: Reader): PbLink = {
    var traceId = ""; var spanId = ""; var state = ""
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var dropped = 0; var flags = 0
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => traceId = r.readBytesHex()
        case (2, 2) => spanId = r.readBytesHex()
        case (3, 2) => state = r.readString()
        case (4, 2) => decodeAttrs(r.readMessage(), attrs)
        case (5, 0) => dropped = r.readVarint().toInt
        case (6, 5) => flags = r.readFixed32()
        case (_, w) => r.skip(w)
      }
    }
    PbLink(traceId, spanId, state, attrs.toMap, dropped, flags)
  }

  private def decodeSpan(r: Reader): PbSpan = {
    var traceId = ""; var spanId = ""; var state = ""; var parent = ""
    var flags = 0; var name = ""; var kind = 0
    var start = 0L; var end = 0L
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var droppedA = 0; var droppedE = 0; var droppedL = 0
    val events = scala.collection.mutable.ArrayBuffer.empty[PbEvent]
    val links = scala.collection.mutable.ArrayBuffer.empty[PbLink]
    var status = PbStatus(0, "")
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2)  => traceId = r.readBytesHex()
        case (2, 2)  => spanId = r.readBytesHex()
        case (3, 2)  => state = r.readString()
        case (4, 2)  => parent = r.readBytesHex()
        case (5, 2)  => name = r.readString()
        case (6, 0)  => kind = r.readVarint().toInt
        case (7, 1)  => start = r.readFixed64()
        case (8, 1)  => end = r.readFixed64()
        case (9, 2)  => decodeAttrs(r.readMessage(), attrs)
        case (10, 0) => droppedA = r.readVarint().toInt
        case (11, 2) => events += decodeSpanEvent(r.readMessage())
        case (12, 0) => droppedE = r.readVarint().toInt
        case (13, 2) => links += decodeSpanLink(r.readMessage())
        case (14, 0) => droppedL = r.readVarint().toInt
        case (15, 2) =>
          val s = r.readMessage()
          var code = 0; var msg = ""
          while (s.hasMore) {
            val t2 = s.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (2, 2) => msg = s.readString()
              case (3, 0) => code = s.readVarint().toInt
              case (_, w) => s.skip(w)
            }
          }
          status = PbStatus(code, msg)
        case (16, 5) => flags = r.readFixed32()
        case (_, w)  => r.skip(w)
      }
    }
    PbSpan(traceId, spanId, state, parent, flags, name, kind, start, end,
      attrs.toMap, droppedA, events.toSeq, droppedE, links.toSeq, droppedL,
      status)
  }

  /** One ExportTraceServiceRequest (= TracesData) → one batch row per
    * (resource, scope), the JSON source's exact grain. */
  def decodeTraces(bytes: Array[Byte]): Seq[PbTraceBatch] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PbTraceBatch]
    val root = new Reader(bytes, 0, bytes.length)
    while (root.hasMore) {
      val tag = root.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => // ResourceSpans
          val rs = root.readMessage()
          var resource = PbResource(Map.empty, 0)
          val scopes = scala.collection.mutable.ArrayBuffer.empty[(PbScope, Seq[PbSpan])]
          while (rs.hasMore) {
            val t2 = rs.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 2) => resource = decodeResource(rs.readMessage())
              case (2, 2) => // ScopeSpans
                val ss = rs.readMessage()
                var scope = PbScope("", "", Map.empty, 0)
                val spans = scala.collection.mutable.ArrayBuffer.empty[PbSpan]
                while (ss.hasMore) {
                  val t3 = ss.readVarint().toInt
                  (t3 >>> 3, t3 & 7) match {
                    case (1, 2) => scope = decodeScope(ss.readMessage())
                    case (2, 2) => spans += decodeSpan(ss.readMessage())
                    case (_, w) => ss.skip(w)
                  }
                }
                scopes += ((scope, spans.toSeq))
              case (_, w) => rs.skip(w)
            }
          }
          scopes.foreach { case (sc, sp) => out += PbTraceBatch(resource, sc, sp) }
        case (_, w) => root.skip(w)
      }
    }
    out.toSeq
  }

  // ---- logs ------------------------------------------------------------

  private def decodeLogRecord(r: Reader): PbLogRecord = {
    var t = 0L; var obs = 0L; var sevNum = 0; var sevText = ""
    var body = ""
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var dropped = 0; var flags = 0
    var traceId = ""; var spanId = ""; var eventName = ""
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 1)  => t = r.readFixed64()
        case (2, 0)  => sevNum = r.readVarint().toInt
        case (3, 2)  => sevText = r.readString()
        case (5, 2)  => body = decodeAnyValue(r.readMessage()).getOrElse("")
        case (6, 2)  => decodeAttrs(r.readMessage(), attrs)
        case (7, 0)  => dropped = r.readVarint().toInt
        case (8, 5)  => flags = r.readFixed32()
        case (9, 2)  => traceId = r.readBytesHex()
        case (10, 2) => spanId = r.readBytesHex()
        case (11, 1) => obs = r.readFixed64()
        case (12, 2) => eventName = r.readString()
        case (_, w)  => r.skip(w)
      }
    }
    PbLogRecord(t, obs, sevNum, sevText, body, attrs.toMap, dropped, flags,
      traceId, spanId, eventName)
  }

  /** One ExportLogsServiceRequest (= LogsData) → (resource, scope) rows. */
  def decodeLogs(bytes: Array[Byte]): Seq[PbLogBatch] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PbLogBatch]
    val root = new Reader(bytes, 0, bytes.length)
    while (root.hasMore) {
      val tag = root.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => // ResourceLogs
          val rl = root.readMessage()
          var resource = PbResource(Map.empty, 0)
          val scopes = scala.collection.mutable.ArrayBuffer.empty[(PbScope, Seq[PbLogRecord])]
          while (rl.hasMore) {
            val t2 = rl.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 2) => resource = decodeResource(rl.readMessage())
              case (2, 2) => // ScopeLogs
                val sl = rl.readMessage()
                var scope = PbScope("", "", Map.empty, 0)
                val records = scala.collection.mutable.ArrayBuffer.empty[PbLogRecord]
                while (sl.hasMore) {
                  val t3 = sl.readVarint().toInt
                  (t3 >>> 3, t3 & 7) match {
                    case (1, 2) => scope = decodeScope(sl.readMessage())
                    case (2, 2) => records += decodeLogRecord(sl.readMessage())
                    case (_, w) => sl.skip(w)
                  }
                }
                scopes += ((scope, records.toSeq))
              case (_, w) => rl.skip(w)
            }
          }
          scopes.foreach { case (sc, rec) => out += PbLogBatch(resource, sc, rec) }
        case (_, w) => root.skip(w)
      }
    }
    out.toSeq
  }

  // ---- metrics ---------------------------------------------------------

  private def decodeExemplar(r: Reader): PbExemplar = {
    var t = 0L
    var asD: Option[Double] = None; var asI: Option[Long] = None
    var spanId = ""; var traceId = ""
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (2, 1) => t = r.readFixed64()
        case (3, 1) => asD = Some(r.readDouble())
        case (4, 2) => spanId = r.readBytesHex()
        case (5, 2) => traceId = r.readBytesHex()
        case (6, 1) => asI = Some(r.readFixed64()) // sfixed64
        case (7, 2) => decodeAttrs(r.readMessage(), attrs)
        case (_, w) => r.skip(w)
      }
    }
    PbExemplar(t, asD, asI, spanId, traceId, attrs.toMap)
  }

  private def decodeNumPoint(r: Reader): PbNumPoint = {
    var t = 0L; var start = 0L; var flags = 0
    var asD: Option[Double] = None; var asI: Option[Long] = None
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val ex = scala.collection.mutable.ArrayBuffer.empty[PbExemplar]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (2, 1) => start = r.readFixed64()
        case (3, 1) => t = r.readFixed64()
        case (4, 1) => asD = Some(r.readDouble())
        case (5, 2) => ex += decodeExemplar(r.readMessage())
        case (6, 1) => asI = Some(r.readFixed64()) // sfixed64
        case (7, 2) => decodeAttrs(r.readMessage(), attrs)
        case (8, 0) => flags = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
    }
    PbNumPoint(t, start, attrs.toMap, flags, asD, asI, ex.toSeq)
  }

  private def decodeHistPoint(r: Reader): PbHistPoint = {
    var t = 0L; var start = 0L; var flags = 0; var count = 0L
    var sum: Option[Double] = None
    var mn: Option[Double] = None; var mx: Option[Double] = None
    val buckets = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val ex = scala.collection.mutable.ArrayBuffer.empty[PbExemplar]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (2, 1)  => start = r.readFixed64()
        case (3, 1)  => t = r.readFixed64()
        case (4, 1)  => count = r.readFixed64()
        case (5, 1)  => sum = Some(r.readDouble())
        case (6, w)  => repeatedLongs(r, w, _.readFixed64(), buckets)
        case (7, 2)  =>
          val m = r.readMessage(); while (m.hasMore) bounds += m.readDouble()
        case (7, 1)  => bounds += r.readDouble()
        case (8, 2)  => ex += decodeExemplar(r.readMessage())
        case (9, 2)  => decodeAttrs(r.readMessage(), attrs)
        case (10, 0) => flags = r.readVarint().toInt
        case (11, 1) => mn = Some(r.readDouble())
        case (12, 1) => mx = Some(r.readDouble())
        case (_, w)  => r.skip(w)
      }
    }
    PbHistPoint(t, start, attrs.toMap, flags, count, sum, mn, mx,
      buckets.toSeq, bounds.toSeq, ex.toSeq)
  }

  private def decodeBuckets(r: Reader): PbBuckets = {
    var offset = 0
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 0) => offset = zigzag32(r.readVarint()) // sint32
        case (2, w) => repeatedLongs(r, w, _.readVarint(), counts)
        case (_, w) => r.skip(w)
      }
    }
    PbBuckets(offset, counts.toSeq)
  }

  private def decodeExpHistPoint(r: Reader): PbExpHistPoint = {
    var t = 0L; var start = 0L; var flags = 0; var count = 0L
    var sum: Option[Double] = None
    var mn: Option[Double] = None; var mx: Option[Double] = None
    var scale = 0; var zeroCount = 0L; var zeroThreshold = 0.0
    var pos = PbBuckets(0, Seq.empty); var neg = PbBuckets(0, Seq.empty)
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val ex = scala.collection.mutable.ArrayBuffer.empty[PbExemplar]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2)  => decodeAttrs(r.readMessage(), attrs)
        case (2, 1)  => start = r.readFixed64()
        case (3, 1)  => t = r.readFixed64()
        case (4, 1)  => count = r.readFixed64()
        case (5, 1)  => sum = Some(r.readDouble())
        case (6, 0)  => scale = zigzag32(r.readVarint()) // sint32
        case (7, 1)  => zeroCount = r.readFixed64()
        case (8, 2)  => pos = decodeBuckets(r.readMessage())
        case (9, 2)  => neg = decodeBuckets(r.readMessage())
        case (10, 0) => flags = r.readVarint().toInt
        case (11, 2) => ex += decodeExemplar(r.readMessage())
        case (12, 1) => mn = Some(r.readDouble())
        case (13, 1) => mx = Some(r.readDouble())
        case (14, 1) => zeroThreshold = r.readDouble()
        case (_, w)  => r.skip(w)
      }
    }
    PbExpHistPoint(t, start, attrs.toMap, flags, count, sum, mn, mx, scale,
      zeroCount, zeroThreshold, pos, neg, ex.toSeq)
  }

  private def decodeSummaryPoint(r: Reader): PbSummaryPoint = {
    var t = 0L; var start = 0L; var flags = 0; var count = 0L; var sum = 0.0
    val qs = scala.collection.mutable.ArrayBuffer.empty[PbQuantile]
    val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (2, 1) => start = r.readFixed64()
        case (3, 1) => t = r.readFixed64()
        case (4, 1) => count = r.readFixed64()
        case (5, 1) => sum = r.readDouble()
        case (6, 2) =>
          val q = r.readMessage()
          var qq = 0.0; var vv = 0.0
          while (q.hasMore) {
            val t2 = q.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 1) => qq = q.readDouble()
              case (2, 1) => vv = q.readDouble()
              case (_, w) => q.skip(w)
            }
          }
          qs += PbQuantile(qq, vv)
        case (7, 2) => decodeAttrs(r.readMessage(), attrs)
        case (8, 0) => flags = r.readVarint().toInt
        case (_, w) => r.skip(w)
      }
    }
    PbSummaryPoint(t, start, attrs.toMap, flags, count, sum, qs.toSeq)
  }

  /** Decoded (metric, oneof-case) pair: exactly one of the five payloads
    * is non-null, mirroring Metric's `data` oneof. */
  private[graft] case class DecodedMetric(info: PbMetricInfo,
                                   num: Seq[PbNumPoint],
                                   hist: Seq[PbHistPoint],
                                   exp: Seq[PbExpHistPoint],
                                   summary: Seq[PbSummaryPoint],
                                   kind: Int) // 0 gauge, 1 sum, 2 hist, 3 exp, 4 summary

  private def decodeMetric(r: Reader): DecodedMetric = {
    var name = ""; var desc = ""; var unit = ""
    val meta = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var temporality = 0; var monotonic = false; var kind = -1
    var num: Seq[PbNumPoint] = Seq.empty
    var hist: Seq[PbHistPoint] = Seq.empty
    var exp: Seq[PbExpHistPoint] = Seq.empty
    var summary: Seq[PbSummaryPoint] = Seq.empty
    def numPoints(m: Reader, withTemporality: Boolean, withMono: Boolean): Seq[PbNumPoint] = {
      val pts = scala.collection.mutable.ArrayBuffer.empty[PbNumPoint]
      while (m.hasMore) {
        val t2 = m.readVarint().toInt
        (t2 >>> 3, t2 & 7) match {
          case (1, 2) => pts += decodeNumPoint(m.readMessage())
          case (2, 0) if withTemporality => temporality = m.readVarint().toInt
          case (3, 0) if withMono => monotonic = m.readVarint() != 0L
          case (_, w) => m.skip(w)
        }
      }
      pts.toSeq
    }
    while (r.hasMore) {
      val tag = r.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2)  => name = r.readString()
        case (2, 2)  => desc = r.readString()
        case (3, 2)  => unit = r.readString()
        case (5, 2)  => kind = 0; num = numPoints(r.readMessage(), false, false)
        case (7, 2)  => kind = 1; num = numPoints(r.readMessage(), true, true)
        case (9, 2)  => // Histogram
          kind = 2
          val m = r.readMessage()
          val pts = scala.collection.mutable.ArrayBuffer.empty[PbHistPoint]
          while (m.hasMore) {
            val t2 = m.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 2) => pts += decodeHistPoint(m.readMessage())
              case (2, 0) => temporality = m.readVarint().toInt
              case (_, w) => m.skip(w)
            }
          }
          hist = pts.toSeq
        case (10, 2) => // ExponentialHistogram
          kind = 3
          val m = r.readMessage()
          val pts = scala.collection.mutable.ArrayBuffer.empty[PbExpHistPoint]
          while (m.hasMore) {
            val t2 = m.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 2) => pts += decodeExpHistPoint(m.readMessage())
              case (2, 0) => temporality = m.readVarint().toInt
              case (_, w) => m.skip(w)
            }
          }
          exp = pts.toSeq
        case (11, 2) => // Summary
          kind = 4
          val m = r.readMessage()
          val pts = scala.collection.mutable.ArrayBuffer.empty[PbSummaryPoint]
          while (m.hasMore) {
            val t2 = m.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 2) => pts += decodeSummaryPoint(m.readMessage())
              case (_, w) => m.skip(w)
            }
          }
          summary = pts.toSeq
        case (12, 2) => decodeAttrs(r.readMessage(), meta)
        case (_, w)  => r.skip(w)
      }
    }
    DecodedMetric(
      PbMetricInfo(name, desc, unit, meta.toMap, temporality, monotonic),
      num, hist, exp, summary, kind)
  }

  private[graft] def decodeMetricScopes(bytes: Array[Byte]): Seq[(PbResource, PbScope, DecodedMetric)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(PbResource, PbScope, DecodedMetric)]
    val root = new Reader(bytes, 0, bytes.length)
    while (root.hasMore) {
      val tag = root.readVarint().toInt
      (tag >>> 3, tag & 7) match {
        case (1, 2) => // ResourceMetrics
          val rm = root.readMessage()
          var resource = PbResource(Map.empty, 0)
          val scoped = scala.collection.mutable.ArrayBuffer.empty[(PbScope, Seq[DecodedMetric])]
          while (rm.hasMore) {
            val t2 = rm.readVarint().toInt
            (t2 >>> 3, t2 & 7) match {
              case (1, 2) => resource = decodeResource(rm.readMessage())
              case (2, 2) => // ScopeMetrics
                val sm = rm.readMessage()
                var scope = PbScope("", "", Map.empty, 0)
                val ms = scala.collection.mutable.ArrayBuffer.empty[DecodedMetric]
                while (sm.hasMore) {
                  val t3 = sm.readVarint().toInt
                  (t3 >>> 3, t3 & 7) match {
                    case (1, 2) => scope = decodeScope(sm.readMessage())
                    case (2, 2) => ms += decodeMetric(sm.readMessage())
                    case (_, w) => sm.skip(w)
                  }
                }
                scoped += ((scope, ms.toSeq))
              case (_, w) => rm.skip(w)
            }
          }
          scoped.foreach { case (sc, ms) =>
            ms.foreach(m => out += ((resource, sc, m)))
          }
        case (_, w) => root.skip(w)
      }
    }
    out.toSeq
  }

  // ---- Spark surface ---------------------------------------------------

  private def contents(spark: SparkSession, path: String): Dataset[Array[Byte]] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path).select("content").as[Array[Byte]]
  }

  /** binaryFile's fixed schema, needed explicitly for streaming reads. */
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** STREAMING twin of [[contents]]: tail a spool directory of proto
    * files (e.g. [[OtlpHttpReceiver]]'s) — exactly-once via the
    * checkpointed file log, decode on executors. `options` are
    * file-source options — notably `maxFilesPerTrigger`, the knob the
    * collector's `batch.send_batch_size` resolves to
    * ([[graft.config.ExporterConfig.Config.streamOptions]]): one spool
    * file is one export request, so it caps requests per micro-batch. */
  private def streamContents(spark: SparkSession, path: String,
                             options: Map[String, String]): Dataset[Array[Byte]] = {
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(binaryFileSchema)
      .options(options).load(path).select("content").as[Array[Byte]]
  }

  /** Streaming OTLP/protobuf traces — the push-ingest read side:
    * [[OtlpHttpReceiver]] spools `ExportTraceServiceRequest` bodies,
    * this source tails them into the [[graft.otel.OtelTraces.flatten]]
    * batch contract. Narrow (per-file decode), so
    * `receiver → tracesStream → flatten → partitioned sink` is one
    * stateless streaming stage — the reference's consumeTraces loop
    * (`/root/reference/exporter.go:101`) re-expressed pull-side. */
  def tracesStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeTraces(_)).toDF()
  }

  /** Streaming twin of [[logs]] (consumeLogs, exporter.go:175). */
  def logsStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeLogs(_)).toDF()
  }

  /** Streaming twin of [[metricsGauge]] (consumeMetrics, exporter.go:130). */
  def metricsGaugeStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 0 => PbNumBatch(res, sc, m.info, m.num)
    }).toDF()
  }

  /** Streaming twin of [[metricsSum]]. */
  def metricsSumStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 1 => PbNumBatch(res, sc, m.info, m.num)
    }).toDF()
  }

  /** Streaming twins of the remaining three metric tables — the
    * reference exports all five types continuously (metrics.go's five
    * tables); histogram points are the most common production metric
    * type, so the spool-tailing pipeline must carry them too. Same
    * narrow per-file decode as gauge/sum: each stream is one stateless
    * stage into [[graft.otel.OtelMetrics]]'s flattens. */
  def metricsHistogramStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 2 => PbHistBatch(res, sc, m.info, m.hist)
    }).toDF()
  }

  /** Streaming twin of [[metricsExponentialHistogram]]. */
  def metricsExponentialHistogramStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 3 => PbExpHistBatch(res, sc, m.info, m.exp)
    }).toDF()
  }

  /** Streaming twin of [[metricsSummary]]. */
  def metricsSummaryStream(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    streamContents(spark, path, options).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 4 => PbSummaryBatch(res, sc, m.info, m.summary)
    }).toDF()
  }

  /** OTLP/protobuf trace files → the [[graft.otel.OtelTraces.flatten]]
    * input (one serialized ExportTraceServiceRequest per file). */
  def traces(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeTraces(_)).toDF()
  }

  /** OTLP/protobuf log files → the [[graft.otel.OtelLogs.flatten]] input. */
  def logs(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeLogs(_)).toDF()
  }

  def metricsGauge(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 0 => PbNumBatch(res, sc, m.info, m.num)
    }).toDF()
  }

  def metricsSum(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 1 => PbNumBatch(res, sc, m.info, m.num)
    }).toDF()
  }

  def metricsHistogram(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 2 => PbHistBatch(res, sc, m.info, m.hist)
    }).toDF()
  }

  def metricsExponentialHistogram(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 3 => PbExpHistBatch(res, sc, m.info, m.exp)
    }).toDF()
  }

  def metricsSummary(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    contents(spark, path).flatMap(decodeMetricScopes(_).collect {
      case (res, sc, m) if m.kind == 4 => PbSummaryBatch(res, sc, m.info, m.summary)
    }).toDF()
  }
}
