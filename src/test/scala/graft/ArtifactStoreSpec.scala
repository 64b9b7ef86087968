package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.ArtifactStore

/** Retention sweep ([[ArtifactStore.sweepStale]]): parameter-keyed cache
  * dirs accumulate one per (corpus, variant, params) forever without a
  * maintenance path. The sweep must delete exactly the DEAD ones —
  * orphaned source, past the age cutoff, crashed staging — and is
  * spec-pinned here to NEVER touch a live key. */
class ArtifactStoreSpec extends SparkSpec {

  private def mkSource(dir: java.nio.file.Path, name: String): String = {
    val p = dir.resolve(name)
    spark.range(5).select(col("id")).write.mode("overwrite").parquet(p.toString)
    p.toString
  }

  test("sweepStale deletes orphaned/expired/staging keys and nothing live") {
    val tmp = Files.createTempDirectory("graft-sweep")
    val root = tmp.resolve("artifacts").toString
    val srcLive = mkSource(tmp, "live.parquet")
    val srcGone = mkSource(tmp, "gone.parquet")

    def build(src: String, key: String): Unit = {
      ArtifactStore.ensure(spark, src, root, key) { stage =>
        spark.range(3).write.mode("overwrite").parquet(stage)
      }
      ()
    }
    build(srcLive, "live_key")
    build(srcGone, "orphan_key")
    build(srcLive, "old_key")
    // a segmented artifact over the soon-to-vanish source
    ArtifactStore.ensureSegmented(spark, root, "orphan_seg",
      sourceFile = Some(srcGone)) { stage =>
      spark.range(2).write.mode("overwrite").parquet(stage)
    }
    // a live segmented artifact, with an append (still live after)
    ArtifactStore.ensureSegmented(spark, root, "live_seg",
      sourceFile = Some(srcLive)) { stage =>
      spark.range(2).write.mode("overwrite").parquet(stage)
    }
    ArtifactStore.appendSegment(spark, root, "live_seg") { stage =>
      spark.range(2, 4).write.mode("overwrite").parquet(stage)
    }
    // a pre-provenance artifact (no _source marker): must be treated live
    val legacy = Paths.get(root, "legacy_key")
    spark.range(1).write.mode("overwrite").parquet(legacy.toString)
    // a crashed builder's staging dir
    Files.createDirectories(Paths.get(root, "__build_crashed_xyz"))

    // nothing is orphaned yet: a sweep with no age cutoff touches ONLY
    // the staging dir — every keyed artifact is live
    assert(ArtifactStore.sweepStale(root).sorted === Seq("__build_crashed_xyz"))

    // the corpus behind orphan_* vanishes
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(srcGone))
    // and old_key ages past the cutoff (builds never refresh its mtime)
    Files.setLastModifiedTime(Paths.get(root, "old_key"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10 * 86400_000L))

    val swept = ArtifactStore.sweepStale(root,
      olderThanMs = Some(7 * 86400_000L)).sorted
    assert(swept === Seq("old_key", "orphan_key", "orphan_seg"))

    // live keys untouched and still readable
    assert(spark.read.parquet(s"$root/live_key").count() === 3L)
    assert(ArtifactStore.readSegmented(spark, root, "live_seg").count() === 4L)
    assert(spark.read.parquet(legacy.toString).count() === 1L)
    // idempotent: a second sweep finds nothing left to delete
    assert(ArtifactStore.sweepStale(root, Some(7 * 86400_000L)) === Seq.empty)
    // a rebuilt key after the sweep is a fresh, working artifact
    build(srcLive, "live_key")
    assert(spark.read.parquet(s"$root/live_key").count() === 3L)
  }
}
