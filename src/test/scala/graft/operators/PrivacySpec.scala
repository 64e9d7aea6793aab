package graft.operators

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Privacy-audit semantics on hand fixtures: k-anonymity group/report
  * arithmetic, l-diversity flags, and the seeded-Laplace DP mechanism's
  * determinism and shape. */
class PrivacySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // lang, source, len_bucket — group (en,web,0) has 3 rows, (en,web,1) one,
  // (fr,web,0) two
  private def fixture = Seq(
    ("en", "web", 0L), ("en", "web", 0L), ("en", "web", 0L),
    ("en", "web", 1L),
    ("fr", "web", 0L), ("fr", "web", 0L)
  ).toDF("lang", "source", "len_bucket")

  test("kAnonymityGroups sizes and at_risk flags at k=3") {
    val g = Privacy.kAnonymityGroups(fixture, Seq("lang", "source", "len_bucket"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4))).toMap
    assert(g(("en", "web", 0L)) == (3L, 0L))
    assert(g(("en", "web", 1L)) == (1L, 1L))
    assert(g(("fr", "web", 0L)) == (2L, 1L))
  }

  test("kAnonymityReport aggregates the group frame exactly") {
    val r = Privacy.kAnonymityReport(fixture, Seq("lang", "source", "len_bucket"), k = 3)
      .collect().head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("groups_below_k") == 2L)
    assert(r.getAs[Long]("rows_below_k") == 3L)
    assert(r.getAs[Long]("min_group") == 1L && r.getAs[Long]("max_group") == 3L)
    assert(r.getAs[Double]("pct_rows_at_risk") == 0.5)
  }

  test("lDiversity counts sensitive support per coarser group") {
    val df = Seq(
      ("en", 0L, "web"), ("en", 0L, "web"), ("en", 0L, "wiki"),
      ("fr", 0L, "web")
    ).toDF("lang", "len_bucket", "source")
    val g = Privacy.lDiversity(df, Seq("lang", "len_bucket"), "source", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(g(("en", 0L)) == (3L, 2L, 0L))   // two sources: diverse at l=2
    assert(g(("fr", 0L)) == (1L, 1L, 1L))   // one source: below l
  }

  test("dpCounts: deterministic noise, noisy_n = n + noise, zero-mean-ish shape") {
    val ev = Seq.tabulate(20)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type")
    val run1 = Privacy.dpCounts(ev, "event_type", epsilon = 0.5, salt = "dp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val run2 = Privacy.dpCounts(ev, "event_type", epsilon = 0.5, salt = "dp").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(run1 == run2, "seeded noise must be identical across runs")
    run1.foreach { case (_, (n, noise, noisy)) =>
      assert(noisy == n.toDouble + noise)
      assert(noise != 0.0, "u is never exactly 1/2 by construction")
    }
    // a different salt is a different draw
    val salted = Privacy.dpCounts(ev, "event_type", epsilon = 0.5, salt = "dp2").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(salted("a") != run1("a")._2)
  }

  test("dpCounts noise scales with 1/epsilon exactly at the quantized grid") {
    val ev = Seq((1L, "a")).toDF("event_id", "event_type")
    val eps05 = Privacy.dpCounts(ev, "event_type", epsilon = 0.5, salt = "dp").collect().head.getDouble(2)
    val eps2 = Privacy.dpCounts(ev, "event_type", epsilon = 2.0, salt = "dp").collect().head.getDouble(2)
    // same uniform, scales 2.0 vs 0.5: ratio 4 up to the DECIMAL(28,12) grid
    assert(math.abs(eps05 / eps2 - 4.0) < 1e-9)
  }

  test("tCloseness: exact TVD including absent sensitive values") {
    // g1 is all-'a', g2 all-'b'; global is 50/50 -> tvd = 0.5 in both,
    // and the absent value's mass must be counted (closed form)
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "a"),
      ("g2", "b"), ("g2", "b"), ("g2", "b")
    ).toDF("qi", "source")
    val t = Privacy.tCloseness(df, Seq("qi"), "source", tBp = 2000)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("group_n"), r.getAs[Double]("tvd"), r.getAs[Long]("above_t"))).toMap
    assert(t("g1") == (3L, 0.5, 1L))
    assert(t("g2") == (3L, 0.5, 1L))
    // a group that mirrors the global distribution has tvd 0
    val even = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")).toDF("qi", "source")
    Privacy.tCloseness(even, Seq("qi"), "source").collect().foreach { r =>
      assert(r.getAs[Double]("tvd") == 0.0 && r.getAs[Long]("above_t") == 0L)
    }
  }

  test("kAnonymitySweep: coarser buckets never increase below-k risk here") {
    val df = Seq.tabulate(40)(i => ("en", "web", i.toLong * 10))
      .toDF("lang", "source", "n_chars")
    val sweep = Privacy.kAnonymitySweep(df, Seq("lang", "source"), "n_chars",
      widths = Seq(10L, 100L, 1000L), k = 5)
      .collect().map(r => r.getAs[Long]("bucket_width") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("rows_below_k"))).toMap
    assert(sweep(10L) == (40L, 40L), "width 10: every row its own group, all at risk")
    assert(sweep(100L)._1 == 4L, "width 100: 4 groups of 10")
    assert(sweep(100L)._2 == 0L && sweep(1000L)._2 == 0L)
    assert(sweep(1000L)._1 == 1L)
  }

  test("dpClippedCounts clips per-user contributions at the cap") {
    // user 1 contributes 6 rows, user 2 three, user 3 one -> clipped 4+3+1
    val ev = (Seq.fill(6)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u, "a") }
      .toDF("event_id", "user_id", "event_type")
    val r = Privacy.dpClippedCounts(ev, "event_type", "user_id", cap = 4, epsilon = 0.5, salt = "dpu")
      .collect().head
    assert(r.getAs[Long]("n_raw") == 10L)
    assert(r.getAs[Long]("n_clipped") == 8L)
    assert(r.getAs[Long]("sensitivity") == 4L)
    assert(r.getAs[Double]("noisy_n") == 8.0 + r.getAs[Double]("noise"))
    // rerun is bit-identical (seeded draw)
    val r2 = Privacy.dpClippedCounts(ev, "event_type", "user_id", cap = 4, epsilon = 0.5, salt = "dpu")
      .collect().head
    assert(r.getAs[Double]("noise") == r2.getAs[Double]("noise"))
  }

  test("dpClippedSum: row clip then user-sum clip bound one user's influence") {
    // user 1: values 8, 8, 8 -> row-clipped 8 each, sum 24, user-clipped 20
    // user 2: one value 50 -> row-clipped 10, under the sum cap
    // user 3: one value -5 -> row-clipped 0
    val ev = Seq((1L, 8.0), (1L, 8.0), (1L, 8.0), (2L, 50.0), (3L, -5.0))
      .zipWithIndex.map { case ((u, v), i) => (i.toLong, u, "a", v) }
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Privacy.dpClippedSum(ev, "event_type", "user_id", "value",
      valueCap = 10.0, sumCap = 20.0, epsilon = 0.5, salt = "dps").collect().head
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Double]("raw_sum") == 69.0)
    assert(r.getAs[Double]("clipped_sum") == 30.0, "20 (capped) + 10 + 0")
    assert(r.getAs[Double]("sensitivity") == 20.0)
    assert(r.getAs[Double]("noisy_sum") == 30.0 + r.getAs[Double]("noise"))
  }

  test("releaseView strips every exact-value and noise column") {
    val ev = Seq.tabulate(20)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type")
    val counts = Privacy.releaseView(
      Privacy.dpCounts(ev, "event_type", 0.5, salt = "s1"), Seq("event_type"))
    assert(counts.columns.toSeq == Seq("event_type", "noisy_n", "epsilon"))
    val hist = Privacy.releaseView(Privacy.dpClippedCounts(
      ev.withColumn("user_id", col("event_id") % 3), "event_type", "user_id",
      cap = 4, epsilon = 0.5, salt = "s1"), Seq("event_type"))
    assert(hist.columns.toSeq == Seq("event_type", "noisy_n", "epsilon", "sensitivity"))
    val sums = Privacy.releaseView(Privacy.dpClippedSum(
      ev.withColumn("user_id", col("event_id") % 3).withColumn("value", lit(1.0)),
      "event_type", "user_id", "value", 10.0, 20.0, 0.5, salt = "s1"), Seq("event_type"))
    assert(sums.columns.toSeq == Seq("event_type", "noisy_sum", "epsilon", "sensitivity"))
    // and a frame with no noisy_* column is refused
    intercept[IllegalArgumentException] { Privacy.releaseView(ev, Seq("event_type")) }
    // ALLOWLIST: a caller-added exact column is refused, not passed through
    intercept[IllegalArgumentException] {
      Privacy.releaseView(
        Privacy.dpCounts(ev, "event_type", 0.5, salt = "s1")
          .withColumn("exact_copy", col("n")), Seq("event_type"))
    }
    // a group column named like an audit-only column is rejected, not dropped
    intercept[IllegalArgumentException] {
      Privacy.releaseView(
        Privacy.dpCounts(ev.withColumnRenamed("event_type", "noise"), "noise",
          0.5, salt = "s1"), Seq("noise"))
    }
  }

  test("dp operators refuse an empty salt (the salt is key material)") {
    val ev = Seq((1L, "a")).toDF("event_id", "event_type")
    intercept[IllegalArgumentException] { Privacy.dpCounts(ev, "event_type", 0.5, salt = "") }
  }

  test("releaseWithLedger: epochs append to the ledger; re-releasing an epoch refuses") {
    val base = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val (releases, ledger) = (s"$base/releases", s"$base/ledger")
    val ev = Seq.tabulate(20)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type")
    val r1 = Privacy.releaseWithLedger(
      Privacy.dpCounts(ev, "event_type", 0.5, salt = "k-e1"),
      Seq("event_type"), epoch = "e1", salt = "k-e1", releases, ledger)
    assert(r1.columns.toSeq == Seq("event_type", "noisy_n", "epsilon"))
    Privacy.releaseWithLedger(
      Privacy.dpCounts(ev, "event_type", 0.25, salt = "k-e2"),
      Seq("event_type"), epoch = "e2", salt = "k-e2", releases, ledger)
    val report = Privacy.ledgerReport(spark.read.parquet(ledger))
      .orderBy("epoch").collect()
    assert(report.map(_.getAs[String]("epoch")).toSeq == Seq("e1", "e2"))
    assert(report.map(_.getAs[Double]("spent_cum")).toSeq == Seq(0.5, 0.75))
    assert(report.map(_.getAs[Long]("n_rows")).toSeq == Seq(2L, 2L))
    // fresh salts per epoch -> distinct salt hashes (the differencing audit)
    assert(report.map(_.getAs[String]("salt_hash")).distinct.length == 2)
    // double-spend: the SAME epoch key refuses, even with a new salt
    val e = intercept[IllegalArgumentException] {
      Privacy.releaseWithLedger(
        Privacy.dpCounts(ev, "event_type", 0.5, salt = "k-e1b"),
        Seq("event_type"), epoch = "e1", salt = "k-e1b", releases, ledger)
    }
    assert(e.getMessage.contains("double-spend"))
    // the refusal left the ledger untouched
    assert(spark.read.parquet(ledger).count() == 2L)
    // regenerating a release from the same inputs is bit-identical: the
    // ledger's release_hash pins the artifact
    val hashes = spark.read.parquet(ledger).orderBy("epoch")
      .collect().map(_.getAs[String]("release_hash"))
    assert(hashes.forall(_.length == 64) && hashes.distinct.length == 2)
  }

  test("releaseWithLedger crash rehearsal: a ledgered stage is completed, never re-spent") {
    val base = java.nio.file.Files.createTempDirectory("graft-ledgercrash").toString
    val (releases, ledger) = (s"$base/releases", s"$base/ledger")
    val ev = Seq.tabulate(20)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type")
    val dp = Privacy.dpCounts(ev, "event_type", 0.5, salt = "k-e1")
    val r1 = Privacy.releaseWithLedger(dp, Seq("event_type"), "e1", "k-e1", releases, ledger)
    val content = r1.collect().map(_.toSeq).toSet
    // simulate the post-append crash window: the ledger row exists but the
    // artifact is still parked at the stage path
    val fs = new org.apache.hadoop.fs.Path(releases)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$releases/epoch=e1"),
      new org.apache.hadoop.fs.Path(s"$releases/epoch=e1.tmp")))
    // the retry COMPLETES the publication: same content, no second ledger row
    val r2 = Privacy.releaseWithLedger(dp, Seq("event_type"), "e1", "k-e1", releases, ledger)
    assert(r2.collect().map(_.toSeq).toSet == content)
    assert(spark.read.parquet(ledger).count() == 1L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$releases/epoch=e1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$releases/epoch=e1.tmp")))
    // ... and once published, the same epoch is a double-spend refusal again
    intercept[IllegalArgumentException] {
      Privacy.releaseWithLedger(dp, Seq("event_type"), "e1", "k-e1b", releases, ledger)
    }
    // a ledger row with NEITHER artifact nor stage is a loud integrity error
    fs.rename(new org.apache.hadoop.fs.Path(s"$releases/epoch=e1"),
      new org.apache.hadoop.fs.Path(s"$releases/epoch=e1.quarantine"))
    val e = intercept[IllegalArgumentException] {
      Privacy.releaseWithLedger(dp, Seq("event_type"), "e1", "k-e1", releases, ledger)
    }
    assert(e.getMessage.contains("diverged"))
  }

  test("releaseWithLedger refuses an empty DP frame before writing anything") {
    val base = java.nio.file.Files.createTempDirectory("graft-ledgerempty").toString
    val (releases, ledger) = (s"$base/releases", s"$base/ledger")
    val ev = Seq((1L, "a")).toDF("event_id", "event_type")
    val empty = Privacy.dpCounts(ev, "event_type", 0.5, salt = "k-e1").where(col("n") < 0L)
    intercept[IllegalArgumentException] {
      Privacy.releaseWithLedger(empty, Seq("event_type"), "e1", "k-e1", releases, ledger)
    }
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(ledger)), "refusal must not append")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$releases/epoch=e1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$releases/epoch=e1.tmp")))
  }

  test("ledgerReport orders spent_cum by release seq, not lexicographic epoch") {
    val base = java.nio.file.Files.createTempDirectory("graft-ledgerseq").toString
    val (releases, ledger) = (s"$base/releases", s"$base/ledger")
    val ev = Seq.tabulate(20)(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "event_type")
    // release order e2 -> e10: lexicographically 'e10' < 'e2', so an
    // epoch-ordered running sum would report e10's cum as 0.25 (wrong)
    Privacy.releaseWithLedger(Privacy.dpCounts(ev, "event_type", 0.5, salt = "k-e2"),
      Seq("event_type"), "e2", "k-e2", releases, ledger)
    Privacy.releaseWithLedger(Privacy.dpCounts(ev, "event_type", 0.25, salt = "k-e10"),
      Seq("event_type"), "e10", "k-e10", releases, ledger)
    val rep = Privacy.ledgerReport(spark.read.parquet(ledger)).collect()
      .map(r => r.getAs[String]("epoch") -> r.getAs[Double]("spent_cum")).toMap
    assert(rep == Map("e2" -> 0.5, "e10" -> 0.75))
  }
}
