package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the [[MetaSnapshot]] refresh contract — the reference MetaCache's
  * behavior (MetaCache.java:47-51, DataStore.java:483) restated for a
  * storage-backed snapshot: serve cached until the refresh interval elapses,
  * reload immediately after an ingest-side markDirty, and never serve a
  * different result than an uncached read would after a reload. */
class MetaSnapshotSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("serves one load per refresh window; clock and dirty both trigger reload") {
    var now = 1000L
    var loads = 0
    var rows = Seq(("m1", "host", "a"))
    val snap = new MetaSnapshot(
      () => { loads += 1; rows.toDF("metric", "tagk", "tagv") },
      refreshMs = 60000L, clock = () => now)

    assert(snap.frame().count() == 1 && loads == 1)
    now += 1000
    assert(snap.frame().count() == 1 && loads == 1) // inside the window: cached
    rows = rows :+ (("m2", "host", "b"))
    now += 1000
    assert(snap.frame().count() == 1 && loads == 1) // still the old snapshot
    now += 60000
    assert(snap.frame().count() == 2 && loads == 2) // window elapsed: reloaded
    rows = rows :+ (("m3", "host", "c"))
    snap.markDirty()                                // the ingest path
    assert(snap.frame().count() == 3 && loads == 3) // dirty: immediate reload
    now += 1000
    assert(snap.frame().count() == 3 && loads == 3) // fresh window: cached again
    snap.close()
  }

  test("refreshMs=0 degenerates to reload-per-access (caching off)") {
    var loads = 0
    val snap = new MetaSnapshot(
      () => { loads += 1; Seq(("m1", "k", "v")).toDF("metric", "tagk", "tagv") },
      refreshMs = 0L, clock = () => 5L)
    snap.frame(); snap.frame(); snap.frame()
    assert(loads == 3)
    snap.close()
  }

  test("the served frame is persisted and materialized") {
    val snap = new MetaSnapshot(
      () => Seq(("m1", "k", "v")).toDF("metric", "tagk", "tagv"),
      refreshMs = 60000L, clock = () => 0L)
    val f = snap.frame()
    assert(f.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    snap.close()
    assert(f.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }
}
