package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, TextOps}
import graft.telemetry.Telemetry

class MultimodalTextSpec extends SparkSpec {

  test("pii scrub redacts emails, phones and IPs; leaves clean text alone") {
    import spark.implicits._
    import graft.llm.TextOps
    val df = Seq(
      (1L, "contact bob@example.com or +1 (555) 123-4567 now"),
      (2L, "server at 10.0.0.1 responded"),
      (3L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.piiScrub($"text").as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "contact <EMAIL> or <PHONE> now")
    assert(out(2L) === "server at <IP> responded")
    assert(out(3L) === "nothing sensitive here at all")
  }

  test("frame sampling emits every 4th 64-byte frame per document") {
    val frames = Multimodal.frameSample(spark, sf).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, fs) =>
      val nFrames = (docs(id) + 63) / 64
      val expected = (0L until nFrames by 4).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq === expected)
      assert(fs.forall(_.frame_len <= 64))
    }
  }

  test("resize metadata respects the bounding box and aspect ratio") {
    val metas = Multimodal.resizeMeta(spark, sf).collect()
    metas.foreach { m =>
      assert(m.out_width <= 128 && m.out_height <= 128)
      assert(m.out_width <= m.src_width && m.out_height <= m.src_height)
      assert(m.out_bytes > 0)
      // aspect ratio preserved within rounding
      val srcRatio = m.src_width.toDouble / m.src_height
      val outRatio = m.out_width.toDouble / m.out_height
      assert(math.abs(srcRatio - outRatio) / srcRatio < 0.05)
    }
  }

  test("winnowing fingerprints are deterministic and non-degenerate") {
    val a = TextOps.winnowFingerprints(spark, sf).orderBy("doc_id").collect()
    val b = TextOps.winnowFingerprints(spark, sf).orderBy("doc_id").collect()
    assert(a.map(_.getLong(1)).sameElements(b.map(_.getLong(1))))
    assert(a.map(_.getLong(2)).sameElements(b.map(_.getLong(2))))
    // every doc yields at least one fingerprint and far fewer than chars
    assert(a.forall(_.getLong(1) > 0))
  }

  test("approx distinct users lands within 5% of exact") {
    val approx = Telemetry.approxDistinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.05,
             s"$k approx=${approx(k)} exact=$ex")
    }
  }
}
