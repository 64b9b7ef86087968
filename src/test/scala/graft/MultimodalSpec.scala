package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Multimodal plumbing: schema/typing of the stubbed decode path, frame
  * sampling explode semantics, and the batched feature-extract boundary. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001)).cache()

  test("mediaFromDocuments: binary payload + cyclic kinds") {
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(media.schema("bytes").dataType.typeName === "binary")
  }

  test("decodeMetaStub: per-kind nullability pattern") {
    val meta = Multimodal.decodeMetaStub(col("kind"), col("bytes"))
    val rows = media.select(col("kind"), meta.as("m")).collect()
    rows.foreach { r =>
      val kind = r.getString(0)
      val m = r.getStruct(1)
      assert(!m.isNullAt(m.fieldIndex("size_bytes")))
      assert(m.isNullAt(m.fieldIndex("width")) === (kind != "image"))
      assert(m.isNullAt(m.fieldIndex("sample_rate")) === (kind != "audio"))
      assert(m.isNullAt(m.fieldIndex("fps")) === (kind != "video"))
    }
  }

  test("sampleFrames explodes one row per sampled frame") {
    val meta = Multimodal.decodeMetaStub(col("kind"), col("bytes"))
    val videos = media.filter(col("kind") === "video").limit(3)
      .withColumn("m", meta)
    val sampled = Multimodal.sampleFrames(videos, col("m"), everyNth = 10)
    val counts = sampled.groupBy("media_id").count().collect()
    val expected = videos.select(col("media_id"),
        (floor((col("m.duration_s") * col("m.fps") - 1) / 10) + 1).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach(r => assert(r.getLong(1) === expected(r.getLong(0))))
  }

  test("extractFeaturesStub: one feature row per media row, deterministic") {
    implicit val s = spark
    val feats = Multimodal.extractFeaturesStub(media, batchSize = 16).collect()
    assert(feats.length === media.count())
    assert(feats.forall(_.dim === 64))
    val again = Multimodal.extractFeaturesStub(media, batchSize = 7).collect()
    assert(feats.sortBy(_.media_id).map(_.checksum).toSeq ===
      again.sortBy(_.media_id).map(_.checksum).toSeq) // batch size must not change features
  }
}
