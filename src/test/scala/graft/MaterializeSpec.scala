package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.functions._
import graft.sources.{DataFingerprint, Materialize}

/** The artifact cache now backs ~30 declared queries (signature tables,
  * fingerprint indexes, ranking snapshots, statistics — the r12
  * ladder), so its staleness behavior is load-bearing: a stale serve
  * after a corpus rewrite would make every consumer silently wrong.
  * Pins: build-once per content, REBUILD on content change (same path),
  * kind isolation, and read-back value fidelity.
  */
class MaterializeSpec extends SparkTestBase {

  private val sp = spark
  import sp.implicits._

  /** A throwaway "sfDir" holding one synthetic table file. */
  private def writeTable(dir: java.nio.file.Path, rows: Seq[Long],
      mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("graft_mat_tbl")
    rows.toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val dst = dir.resolve("documents.parquet")
    Files.move(part, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeMs))
  }

  test("once(): builds once per content, rebuilds on rewrite, isolates kinds") {
    val dir = Files.createTempDirectory("graft_mat_sf")
    val now = System.currentTimeMillis()
    writeTable(dir, Seq(1L, 2L, 3L), now - 60000)

    var builds = 0
    def artifact(kind: String) =
      Materialize.once(spark, dir.toString, Seq("documents"), kind)({
        builds += 1
        spark.read.parquet(s"$dir/documents.parquet")
          .agg(sum(col("v")).cast("long").as("s"))
      })

    // 1. first use builds; repeated use serves the written artifact
    assert(artifact("spec_mat_sum").collect()(0).getLong(0) === 6L)
    assert(builds === 1)
    (1 to 3).foreach(_ =>
      assert(artifact("spec_mat_sum").collect()(0).getLong(0) === 6L))
    assert(builds === 1, "by-name build must not re-evaluate on hits")

    // 2. a DIFFERENT kind over the same sources is its own artifact
    assert(Materialize.once(spark, dir.toString, Seq("documents"),
        "spec_mat_cnt")({
      builds += 1
      spark.read.parquet(s"$dir/documents.parquet")
        .agg(count(lit(1)).as("n"))
    }).collect()(0).getLong(0) === 3L)
    assert(builds === 2)

    // 3. REWRITING the source (new content + mtime) must invalidate:
    //    the fingerprint changes, so the artifact rebuilds from the
    //    new data — a stale serve here would poison every consumer
    val fpBefore = DataFingerprint.ofTable(dir.toString, "documents")
    writeTable(dir, Seq(10L, 20L, 30L, 40L), now - 30000)
    val fpAfter = DataFingerprint.ofTable(dir.toString, "documents")
    assert(fpBefore !== fpAfter, "fingerprint must see the rewrite")
    assert(artifact("spec_mat_sum").collect()(0).getLong(0) === 100L,
      "rewritten source must serve the NEW artifact content")
    assert(builds === 3)

    // 4. and the new artifact is itself cached
    assert(artifact("spec_mat_sum").collect()(0).getLong(0) === 100L)
    assert(builds === 3)
  }

  test("once(): an in-place rewrite that only touches a part file still invalidates") {
    // Tables.dataFingerprint's documented hazard: a directory's own
    // mtime may not change when a part inside is rewritten. The
    // artifact fingerprint lists the FILES, so it must move.
    val dir = Files.createTempDirectory("graft_mat_sf2")
    val now = System.currentTimeMillis()
    writeTable(dir, Seq(5L), now - 90000)
    val before = DataFingerprint.ofTable(dir.toString, "documents")
    // same row count, same byte-length class, different mtime
    writeTable(dir, Seq(7L), now - 45000)
    val after = DataFingerprint.ofTable(dir.toString, "documents")
    assert(before !== after)
  }
}
