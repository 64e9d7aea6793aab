package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev-only scale smoke for the ROUND-13 lifecycle passes, same replica
 * scheme as [[ScaleSmoke]]. The scale claims under test:
 *   - bm25Maintained READ latency is FLAT as the index grows (the 64-way
 *     `tb` bucket pruning means a query batch's scan cost tracks the
 *     matching buckets' share of the corpus, never the index row count
 *     beyond that share — growth shows up only inside the touched buckets);
 *   - lshMaintain increment cost ≪ bootstrap (sign ONLY the delta, append);
 *     lshCandidates pair work is delta-bounded (delta bands x pruned store);
 *   - postingsCompact rewrite is one bucket-partitioned shuffle, and the
 *     compacted store reads FASTER than the increment-accumulated one;
 *   - postingsAgeOff cost tracks the affected buckets, and the pass is
 *     idempotent (retry drops nothing).
 * Run: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_SMOKE_REPS (default
 * 4) and SPARK_GRAFT_SMOKE_GROW (default 20) set the small and grown tiers;
 * SPARK_GRAFT_SMOKE_ONLY=substr isolates one row per JVM.
 */
object ScaleSmokeR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "4").toInt
    val grow = sys.env.getOrElse("SPARK_GRAFT_SMOKE_GROW", "20").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    def t[A](name: String)(f: => A): Unit =
      if (only.exists(s => !name.contains(s))) ()
      else {
        val t0 = System.nanoTime(); f
        println(f"SCALER13 $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = graft.operators.Points.table(spark, sfDir, "documents")
    val n = base.count()
    def corpus(r: Int) = base
      .crossJoin(spark.range(r.toLong).select(col("id").as("r")))
      .select((col("doc_id") * r + col("r")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("r")).as("text"))
      .repartition(32)
    val small = corpus(reps).cache()
    val big = corpus(grow).cache()
    println(s"SCALER13 tiers: ${small.count()} vs ${big.count()} docs (${n} x $reps/$grow)")
    val q = base.limit(2000).where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
      .cache()
    println(s"SCALER13 probe batch: ${q.count()} queries")

    val tmp = java.nio.file.Files.createTempDirectory("graft-smoke13").toString
    val (idxS, idxB) = (s"$tmp/small/index", s"$tmp/big/index")

    t(s"postings bootstrap ${reps}x") {
      Maintenance.postingsMaintain(spark, idxS, small, passId = "boot")
    }
    t(s"postings bootstrap ${grow}x") {
      Maintenance.postingsMaintain(spark, idxB, big, passId = "boot")
    }
    // READ-SIDE growth: same query batch against both indexes. Warm each
    // once (codegen), then report the measured pass — the claim is the
    // grown read grows ~with the matched share (grow/reps of the bucket
    // volume), NOT a fixed multiple of total index size beyond that.
    if (only.forall("bm25Maintained read".contains(_)) || only.isEmpty) {
      Maintenance.bm25Maintained(spark, idxS, q).count()
      val (_, rs) = timed(Maintenance.bm25Maintained(spark, idxS, q).count())
      Maintenance.bm25Maintained(spark, idxB, q).count()
      val (_, rb) = timed(Maintenance.bm25Maintained(spark, idxB, q).count())
      println(f"SCALER13 bm25Maintained read ${reps}x $rs%.2f s vs ${grow}x $rb%.2f s " +
        f"(${grow.toDouble / reps}%.0fx index -> ${rb / rs}%.2fx read)")
      val plan = Maintenance.bm25Maintained(spark, idxB, q).queryExecution.executedPlan.toString
      println(s"SCALER13 grown-store read prunes on tb: ${plan.contains("PartitionFilters")}")
    }

    // positional sidecar: bootstrap overhead, the FLAT phrase-read claim
    // (pb pruning), and maintained read vs the batch corpus posexplode at
    // the grown tier (the read the sidecar exists to delete)
    if (only.isEmpty || only.exists("positions".contains(_))) {
      val (pxS, pxB) = (s"$tmp/possmall/index", s"$tmp/posbig/index")
      val (_, pbs) = timed(Maintenance.postingsMaintain(spark, pxS, small,
        passId = "boot", positions = true))
      val (_, pbb) = timed(Maintenance.postingsMaintain(spark, pxB, big,
        passId = "boot", positions = true))
      println(f"SCALER13 positions bootstrap ${reps}x $pbs%.2f s, ${grow}x $pbb%.2f s (incl. sidecar)")
      Maintenance.phraseMaintained(spark, pxS, q).count()
      val (_, prS) = timed(Maintenance.phraseMaintained(spark, pxS, q).count())
      Maintenance.phraseMaintained(spark, pxB, q).count()
      val (_, prB) = timed(Maintenance.phraseMaintained(spark, pxB, q).count())
      val (_, prBatch) = timed(graft.operators.Search.phraseHits(big, q).count())
      println(f"SCALER13 phraseMaintained read ${reps}x $prS%.2f s vs ${grow}x $prB%.2f s " +
        f"(${grow.toDouble / reps}%.0fx index -> ${prB / prS}%.2fx read); " +
        f"batch corpus posexplode at ${grow}x: $prBatch%.2f s")
      val (_, snB) = timed(Maintenance.snippetsMaintained(spark, pxB, q).count())
      println(f"SCALER13 snippetsMaintained ${grow}x $snB%.2f s")
    }

    // increment-accumulation -> compaction: 6 passes of ~2% each on the
    // small index, then the census-driven rewrite
    val inc = base.limit((n / 50).toInt max 200)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
    t("postings 6 increments (~2% each)") {
      (0 until 6).foreach { k =>
        Maintenance.postingsMaintain(spark,
          idxS, inc.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"), col("text")),
          passId = s"inc$k")
      }
    }
    if (only.isEmpty || only.exists("compact".contains(_))) {
      Maintenance.bm25Maintained(spark, idxS, q).count()
      val (_, preRead) = timed(Maintenance.bm25Maintained(spark, idxS, q).count())
      val (rep, ct) = timed(Maintenance.postingsCompact(spark, idxS, maxFilesPerBucket = 4))
      val (_, postRead) = timed(Maintenance.bm25Maintained(spark, idxS, q).count())
      println(f"SCALER13 postingsCompact $ct%.2f s (${rep.render}); " +
        f"read before $preRead%.2f s after $postRead%.2f s")
    }

    // retention: drop the 6 increments' docs (~12% of rows, all buckets
    // likely affected at this term mix) and measure the pass + idempotency
    if (only.isEmpty || only.exists("ageoff".contains(_))) {
      val dropIds = spark.range(6).select(col("id").as("k"))
        .crossJoin(inc.select(col("doc_id").as("d")))
        .select((col("d") + col("k") * 1000000L).as("doc_id"))
      val (r1, t1) = timed(Maintenance.postingsAgeOff(spark, idxS, dropIds))
      val (r2, t2) = timed(Maintenance.postingsAgeOff(spark, idxS, dropIds))
      println(f"SCALER13 postingsAgeOff $t1%.2f s (${r1.render}); retry $t2%.2f s " +
        f"(dropped ${r2.rowsDropped} — idempotent)")
      println(s"SCALER13 postingsAudit after age-off ok=${Maintenance.postingsAudit(spark, idxS).ok}")
    }

    // IVF maintained store: list_id-pruned probe read growth + the
    // staged-increment cost vs bootstrap
    if (only.isEmpty || only.exists("ivf".contains(_))) {
      val eb = graft.operators.Points.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      def ecorpus(r: Int) = eb
        .crossJoin(spark.range(r.toLong).select(col("id").as("r")))
        .select((col("vec_id") * r + col("r")).as("vec_id"), col("embedding"))
        .repartition(32)
      val (eS, eB) = (ecorpus(reps).cache(), ecorpus(grow).cache())
      println(s"SCALER13 ivf tiers: ${eS.count()} vs ${eB.count()} vectors")
      val (ivS, ivB) = (s"$tmp/ivfsmall/index", s"$tmp/ivfbig/index")
      val (_, ibS) = timed(Maintenance.ivfMaintain(spark, ivS, eS, nLists = 64, passId = "boot"))
      val (_, ibB) = timed(Maintenance.ivfMaintain(spark, ivB, eB, nLists = 64, passId = "boot"))
      println(f"SCALER13 ivf bootstrap ${reps}x $ibS%.2f s, ${grow}x $ibB%.2f s")
      val inc = eb.limit(2000)
        .select((col("vec_id") + lit(900000000L)).as("vec_id"), col("embedding"))
      val (_, iiB) = timed(Maintenance.ivfMaintain(spark, ivB, inc, nLists = 64, passId = "inc1"))
      println(f"SCALER13 ivf staged increment (2k vecs) into ${grow}x: $iiB%.2f s")
      val pq = eb.where(col("vec_id") % 97 === 0).limit(200)
      Maintenance.ivfKnnMaintained(spark, ivS, pq, k = 10, nProbe = 4).count()
      val (_, irS) = timed(Maintenance.ivfKnnMaintained(spark, ivS, pq, k = 10, nProbe = 4).count())
      Maintenance.ivfKnnMaintained(spark, ivB, pq, k = 10, nProbe = 4).count()
      val (_, irB) = timed(Maintenance.ivfKnnMaintained(spark, ivB, pq, k = 10, nProbe = 4).count())
      println(f"SCALER13 ivfKnnMaintained read ${reps}x $irS%.2f s vs ${grow}x $irB%.2f s " +
        f"(${grow.toDouble / reps}%.0fx index -> ${irB / irS}%.2fx read)")
      val plan = Maintenance.ivfKnnMaintained(spark, ivB, pq, k = 10, nProbe = 4)
        .queryExecution.executedPlan.toString
      println(s"SCALER13 grown ivf probe prunes on list_id: ${plan.contains("PartitionFilters")}")
      println(s"SCALER13 ivfAudit ok=${Maintenance.ivfAudit(spark, ivB).ok}")
    }

    // LSH signature store: 95% bootstrap vs 5% increment + delta screen
    if (only.isEmpty || only.exists("lsh".contains(_))) {
      val lshIdx = s"$tmp/lsh/index"
      val bootDocs = big.where(col("doc_id") % 20 =!= 0)
      val incDocs = big.where(col("doc_id") % 20 === 0)
      val (_, bt) = timed(Maintenance.lshMaintain(spark, lshIdx, bootDocs, passId = "boot"))
      val (cand, st) = timed {
        val c = Maintenance.lshCandidates(spark, lshIdx, incDocs); c.count()
      }
      val (_, it) = timed(Maintenance.lshMaintain(spark, lshIdx, incDocs, passId = "inc"))
      println(f"SCALER13 lsh bootstrap $bt%.2f s (95%%), candidates $st%.2f s, " +
        f"increment append $it%.2f s (5%%), pairs $cand")
      println(s"SCALER13 lshAudit ok=${Maintenance.lshAudit(spark, lshIdx).ok}")
    }
    spark.stop()
  }
}
