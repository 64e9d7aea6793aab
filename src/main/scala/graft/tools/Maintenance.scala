package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.sources.PointStore

/**
 * Retention maintenance driver — the single-pass operational entry point for
 * the engine's age-off surface (SURVEY L1-L3), the analog of the reference's
 * scheduled age-off/compaction: the data side drops whole expired
 * `metric=/dt=` day directories plus fully-expired boundary-day `hr=`
 * directories (the tablet-drop compaction shape,
 * server/src/main/java/timely/server/store/compaction/
 * MetricCompactionStrategy.java — file metadata only, no surviving row is
 * rewritten), then the meta catalog is aged to the survivors' metric set
 * (MetaAgeOffIterator.java:77-97: a catalog row lives iff its metric still
 * has live points). Query-time [[PointStore.clampStart]] keeps the
 * sub-hour boundary slack invisible, like the reference's scan-time
 * age-off iterator.
 *
 * Dry-run mode reports everything the pass WOULD do — partition paths and
 * meta row delta — touching nothing, so an operator can review a TTL change
 * before running it for real.
 */
object Maintenance {

  /** Crash recovery for a [[swapDir]]-maintained directory: the one
    * mid-swap crash window leaves `target` missing with the old data parked
    * at `target.bak` — restore it before anything reads or stages, so the
    * next pass sees the pre-crash state instead of bootstrapping from
    * scratch (or, worse, letting a later swap garbage-collect the `.bak`
    * that still holds the only copy). Called at the entry of every
    * maintained-pass function AND defensively inside [[swapDir]]; a no-op
    * when `target` exists. */
  private def recoverDir(fs: org.apache.hadoop.fs.FileSystem, target: Path): Unit = {
    val bak = new Path(target.toString + ".bak")
    if (!fs.exists(target) && fs.exists(bak))
      require(fs.rename(bak, target), s"crash recovery: rename $bak -> $target failed")
  }

  /** Crash-safe directory swap: `old -> .bak`, `tmp -> target`, delete
    * `.bak` — at every instant either the old or the new directory exists
    * under a recoverable name (a plain delete-then-rename has a window
    * where a crash loses BOTH). A leftover `.bak` after a crash is the old
    * data (auto-restored by [[recoverDir]] on the next pass); a leftover
    * `.tmp` is an incomplete rewrite — safe to resolve by hand, never data
    * loss. */
  private def swapDir(fs: org.apache.hadoop.fs.FileSystem, tmp: Path, target: Path): Unit = {
    recoverDir(fs, target) // never delete a .bak that is the only copy
    val bak = new Path(target.toString + ".bak")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(target)) require(fs.rename(target, bak), s"rename $target -> $bak failed")
    require(fs.rename(tmp, target), s"rename $tmp -> $target failed")
    fs.delete(bak, true)
  }

  /** Census-driven z-order compaction policy for [[run]] — the analog of
    * the reference's scheduled compaction strategies
    * (MetricCompactionStrategy.java:20-60): the store self-schedules a
    * [[compactZOrder]] rewrite when EITHER measured signal degrades past
    * its threshold — the [[PointStore.census]] average files-per-hour
    * exceeds `maxFilesPerPartition` (small-files pressure from
    * append-accumulated micro-batches), or the REAL file-envelope skip
    * ratio for the policy's x-slab ([[graft.operators.Layout.filePruneReport]]
    * on the written files) falls below `minSkipRatio` (locality drift —
    * new files straddle the residual dimension). Both signals are
    * measurements of the actual files, not folklore. Set
    * `maxFilesPerPartition` ABOVE the per-partition file count the rewrite
    * itself produces (~`numFiles` / populated hour dirs), or a
    * freshly-compacted store re-triggers every pass. */
  case class CompactionPolicy(
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column,
      bits: Int,
      numFiles: Int,
      auditXLo: Long,
      auditXHi: Long,
      maxFilesPerPartition: Double = 4.0,
      minSkipRatio: Double = 0.5)

  /** What one maintenance pass did (or, dry run, would do). */
  case class Report(
      dryRun: Boolean,
      droppedPartitions: Seq[String],
      metaRowsBefore: Long,
      metaRowsAfter: Long,
      compaction: Option[CompactReport] = None) {
    def render: String = {
      val verb = if (dryRun) "would drop" else "dropped"
      (s"maintenance${if (dryRun) " (DRY RUN)" else ""}: " +
        s"$verb ${droppedPartitions.size} partition dir(s); " +
        s"meta $metaRowsBefore -> $metaRowsAfter rows") +
        droppedPartitions.map(p => s"\n  $verb $p").mkString +
        compaction.map(c => s"\n  ${c.render}").getOrElse("")
    }
  }

  /**
   * One maintenance pass over a store: partition-level data age-off, then
   * meta age-off against the surviving data. The meta rewrite stages into
   * `<metaDir>.tmp` and swaps via rename — readers never observe a
   * half-written catalog dir. No-op (with an accurate report) when nothing
   * is expired.
   */
  def run(
      spark: SparkSession,
      dataDir: String,
      metaDir: String,
      ttlMsByPrefix: Map[String, Long],
      nowMs: Long = System.currentTimeMillis(),
      dryRun: Boolean = false,
      compaction: Option[CompactionPolicy] = None): Report = {
    val dropped = PointStore.ageOffDropPartitions(spark, dataDir, ttlMsByPrefix, nowMs, dryRun)
    val fs = new Path(metaDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(fs, new Path(metaDir)) // mid-swap crash: .bak is the catalog
    if (!fs.exists(new Path(metaDir)))
      return Report(dryRun, dropped, 0L, 0L,
        compaction.flatMap(maybeCompact(spark, dataDir, _, dryRun)))
    val metaBefore = spark.read.parquet(metaDir)
    val before = metaBefore.count()
    // the surviving-data metric set. In dry-run the data dirs are untouched,
    // so survivors are computed from the partition list MINUS the would-drop
    // set (metric-level: a metric survives iff it keeps any partition)
    val after =
      if (dryRun) {
        val dropSet = dropped.map(_.takeWhile(_ != '/')).toSet
        val allMetrics = partitionMetrics(spark, dataDir)
        val liveMetrics = allMetrics.filterNot { m =>
          // a metric dies iff EVERY one of its day dirs is in the drop set
          val kept = partitionDays(spark, dataDir, m)
            .exists(d => !dropped.contains(s"$m/$d"))
          !kept
        }
        import spark.implicits._
        metaBefore.join(liveMetrics.toDF("metric"), Seq("metric"), "left_semi").count()
      } else {
        // a fully-expired store leaves no readable parquet: every catalog row dies
        val live =
          try PointStore.read(spark, dataDir)
          catch { case _: org.apache.spark.sql.AnalysisException => metaBefore.limit(0) }
        val aged = PointStore.metaAgeOff(metaBefore, live)
        val tmp = new Path(metaDir + ".tmp")
        aged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val n = spark.read.parquet(tmp.toString).count()
        swapDir(fs, tmp, new Path(metaDir))
        n
      }
    Report(dryRun, dropped, before, after,
      compaction.flatMap(maybeCompact(spark, dataDir, _, dryRun)))
  }

  /** The census-driven trigger behind [[run]]'s `compaction` policy: measure
    * both signals on the CURRENT store files, and only when one degrades
    * past its threshold run (or, dry-run, size up) a [[compactZOrder]] pass.
    * Returns None when the store is healthy — a no-op pass measures two
    * cheap aggregates and rewrites nothing. */
  private def maybeCompact(
      spark: SparkSession,
      dataDir: String,
      policy: CompactionPolicy,
      dryRun: Boolean): Option[CompactReport] = {
    import graft.operators.Layout
    import org.apache.spark.sql.functions.{avg => favg}
    val store =
      try PointStore.read(spark, dataDir)
      catch { case _: org.apache.spark.sql.AnalysisException => return None }
    val filesPerHr = PointStore.census(spark, dataDir)
      .agg(favg(org.apache.spark.sql.functions.col("files_per_partition"))).head
    val avgFiles = if (filesPerHr.isNullAt(0)) 0.0 else filesPerHr.getDouble(0)
    val skip = Layout.filePruneReport(
        Layout.fileEnvelopes(store, policy.xCol, policy.yCol),
        policy.auditXLo, policy.auditXHi)
      .collect().head.getAs[Double]("file_skip_ratio")
    val triggered = avgFiles > policy.maxFilesPerPartition || skip < policy.minSkipRatio
    if (!triggered) None
    else Some(compactZOrder(spark, dataDir, policy.xCol, policy.yCol, policy.bits,
      policy.numFiles, policy.auditXLo, policy.auditXHi, dryRun))
  }

  /** What one SCD2-dimension maintenance pass did (or would do). */
  case class Scd2Report(
      dryRun: Boolean,
      bootstrap: Boolean,
      rowsBefore: Long,
      rowsAfter: Long,
      openBefore: Long,
      openAfter: Long) {
    def render: String =
      s"scd2${if (dryRun) " (DRY RUN)" else ""}: " +
        s"${if (bootstrap) "bootstrapped" else "applied delta"}; " +
        s"history $rowsBefore -> $rowsAfter rows, open $openBefore -> $openAfter"
  }

  /**
   * Maintained SCD2 dimension on the store: the history directory holds the
   * [[graft.operators.Cdc.scd2]] frame, and each pass folds ONE event delta
   * in via [[graft.operators.Cdc.scd2Apply]] — closed intervals are never
   * recomputed, so a pass costs O(delta + open keys) regardless of history
   * size (the 100 TB dimension-table maintenance shape). First pass on a
   * missing directory bootstraps with the batch [[graft.operators.Cdc.scd2]].
   * The rewrite stages into `<dimDir>.tmp` and swaps via rename, like the
   * meta catalog in [[run]] — readers never observe a half-written
   * dimension. Dry-run reports the would-be delta, touching nothing.
   */
  def scd2Maintain(
      spark: SparkSession,
      dimDir: String,
      events: org.apache.spark.sql.DataFrame,
      keyCol: String,
      attrCol: String,
      tsExpr: org.apache.spark.sql.Column,
      tieCol: String,
      dryRun: Boolean = false): Scd2Report = {
    import graft.operators.Cdc
    val fs = new Path(dimDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a mid-swap crash must read as "history exists" (restored), never as a
    // fresh bootstrap that would let the next swap delete the only copy
    recoverDir(fs, new Path(dimDir))
    val exists = fs.exists(new Path(dimDir))
    val before = if (exists) spark.read.parquet(dimDir) else null
    val rowsBefore = if (exists) before.count() else 0L
    val openBefore =
      if (exists) before.where(org.apache.spark.sql.functions.col("is_current") === 1L).count()
      else 0L
    val next =
      if (exists) Cdc.scd2Apply(before, events, keyCol, attrCol, tsExpr, tieCol)
      else Cdc.scd2(events, keyCol, attrCol, tsExpr, tieCol)
    if (dryRun) {
      val rowsAfter = next.count()
      val openAfter = next.where(org.apache.spark.sql.functions.col("is_current") === 1L).count()
      Scd2Report(dryRun = true, bootstrap = !exists, rowsBefore, rowsAfter, openBefore, openAfter)
    } else {
      val tmp = new Path(dimDir + ".tmp")
      next.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val written = spark.read.parquet(tmp.toString)
      val rowsAfter = written.count()
      val openAfter = written.where(org.apache.spark.sql.functions.col("is_current") === 1L).count()
      swapDir(fs, tmp, new Path(dimDir))
      Scd2Report(dryRun = false, bootstrap = !exists, rowsBefore, rowsAfter, openBefore, openAfter)
    }
  }

  /** What one z-order compaction pass did (or would do). */
  case class CompactReport(
      dryRun: Boolean,
      rows: Long,
      filesBefore: Long,
      filesAfter: Long,
      skipBefore: Double,
      skipAfter: Double) {
    def render: String =
      f"compact${if (dryRun) " (DRY RUN)" else ""}: $rows rows, " +
        f"files $filesBefore -> $filesAfter, x-slab skip ratio " +
        f"$skipBefore%.2f -> $skipAfter%.2f"
  }

  /**
   * Z-order COMPACTION of an existing store: rewrite a (typically
   * append-accumulated, small-files) store directory through
   * [[PointStore.writeZOrdered]], so both the file-count pressure the
   * census reports and the residual-dimension skip ratio improve in one
   * pass — the ops move after [[PointStore.census]] flags a bloated day.
   * The rewrite stages into `<dataDir>.tmp` + rename-swap (same pattern as
   * the meta catalog in [[run]]). The report carries MEASURED before/after
   * per-file envelope skip ratios for the given x-slab
   * ([[graft.operators.Layout.filePruneReport]] on the real files), so the
   * operator sees what the rewrite bought, not folklore.
   */
  def compactZOrder(
      spark: SparkSession,
      dataDir: String,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column,
      bits: Int,
      numFiles: Int,
      auditXLo: Long,
      auditXHi: Long,
      dryRun: Boolean = false): CompactReport = {
    import graft.operators.Layout
    def skipOf(df: org.apache.spark.sql.DataFrame): Double =
      Layout.filePruneReport(Layout.fileEnvelopes(df, xCol, yCol), auditXLo, auditXHi)
        .collect().head.getAs[Double]("file_skip_ratio")
    def nFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.select(org.apache.spark.sql.functions.input_file_name()).distinct().count()
    val fsPre = new Path(dataDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(fsPre, new Path(dataDir)) // mid-swap crash: .bak is the store
    val before = PointStore.read(spark, dataDir)
    val rows = before.count()
    val filesBefore = nFiles(before)
    val skipBefore = skipOf(before)
    if (dryRun) return CompactReport(dryRun = true, rows, filesBefore, filesBefore,
      skipBefore, skipBefore)
    val fs = new Path(dataDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = dataDir + ".tmp"
    // drop the derived partition cols before rewrite: writeZOrdered re-adds
    // them from ts, and a duplicate dt/hr column would break partitionBy
    PointStore.writeZOrdered(before.drop("dt", "hr"), tmp, xCol, yCol, bits, numFiles,
      mode = SaveMode.Overwrite)
    swapDir(fs, new Path(tmp), new Path(dataDir))
    val after = PointStore.read(spark, dataDir)
    CompactReport(dryRun = false, rows, filesBefore, nFiles(after), skipBefore, skipOf(after))
  }

  /** What one IVF-index maintenance pass did (or would do). */
  case class IvfReport(
      dryRun: Boolean,
      bootstrap: Boolean,
      vectorsBefore: Long,
      vectorsAfter: Long,
      nLists: Long) {
    def render: String =
      s"ivf${if (dryRun) " (DRY RUN)" else ""}: " +
        s"${if (bootstrap) "trained + assigned" else "assigned increment"}; " +
        s"index $vectorsBefore -> $vectorsAfter vectors over $nLists lists"
  }

  /**
   * Maintained IVF ANN index on the store: `indexDir/centroids` holds the
   * trained centroid frame (fixed between retrains), `indexDir/assignments`
   * the (vec_id, embedding, vnorm, list_id) rows. Bootstrap trains seeded
   * centroids ([[graft.operators.SimilarityIvf.centroids]]) and batch-
   * assigns the corpus; every later pass folds ONE increment of NEW vectors
   * in via the stateless [[graft.operators.SimilarityIvf.assignStream]]
   * (bit-equal to the batch assign by its spec) and APPENDS — existing
   * assignments are immutable under fixed centroids, so a pass costs
   * O(increment), never O(index). Search composes unchanged:
   * [[graft.operators.SimilarityIvf.search]](assignments, centroids, ...).
   *
   * Contract: increment vec_ids must be new (the index is keyed storage,
   * not an upsert target); retraining centroids is a new bootstrap into a
   * fresh dir, never an in-place mutation.
   */
  def ivfMaintain(
      spark: SparkSession,
      indexDir: String,
      vecs: org.apache.spark.sql.DataFrame,
      nLists: Int,
      dryRun: Boolean = false): IvfReport = {
    import graft.operators.SimilarityIvf
    val centsPath = new Path(indexDir, "centroids")
    val assignPath = new Path(indexDir, "assignments")
    val fs = centsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(fs, centsPath)
    recoverDir(fs, assignPath)
    val exists = fs.exists(centsPath)
    if (!exists) {
      val cents = SimilarityIvf.centroids(vecs, nLists)
      val assigned = SimilarityIvf.assign(vecs, cents)
      val n = if (dryRun) assigned.count() else {
        cents.write.mode(SaveMode.Overwrite).parquet(centsPath.toString)
        assigned.write.mode(SaveMode.Overwrite).parquet(assignPath.toString)
        spark.read.parquet(assignPath.toString).count()
      }
      IvfReport(dryRun, bootstrap = true, 0L, n, nLists.toLong)
    } else {
      val cents = spark.read.parquet(centsPath.toString)
      val before = spark.read.parquet(assignPath.toString).count()
      val increment = SimilarityIvf.assignStream(vecs, cents)
      if (dryRun)
        IvfReport(dryRun = true, bootstrap = false, before,
          before + increment.count(), cents.count())
      else {
        increment.write.mode(SaveMode.Append).parquet(assignPath.toString)
        IvfReport(dryRun = false, bootstrap = false, before,
          spark.read.parquet(assignPath.toString).count(), cents.count())
      }
    }
  }

  /** What one IVF retrain pass did (or would do). */
  case class IvfRetrainReport(
      dryRun: Boolean,
      vectors: Long,
      listsBefore: Long,
      listsAfter: Long) {
    def render: String =
      s"ivf retrain${if (dryRun) " (DRY RUN)" else ""}: " +
        s"$vectors vectors rebucketed, $listsBefore -> $listsAfter lists"
  }

  /**
   * RETRAIN an [[ivfMaintain]] index: [[ivfMaintain]] holds centroids fixed
   * forever (the append-pass contract), so after enough drift or growth the
   * list geometry goes stale — this pass trains centroids-v2 from the
   * CURRENT vector set (the persisted assignments are the vector store:
   * vec_id + embedding), backfills EVERY assignment against the new
   * centroids with the batch [[graft.operators.SimilarityIvf.assign]], and
   * atomically swaps both directories (`.tmp` stage + [[swapDir]], crash
   * windows auto-restored by [[recoverDir]] on the next pass). Readers
   * never observe v1 centroids with v2 assignments or vice versa beyond
   * the instant between the two swaps — and that instant is itself safe,
   * because [[graft.operators.SimilarityIvf.search]] joins assignments to
   * centroids on list_id (a transiently mixed pair degrades recall, never
   * correctness).
   *
   * Equivalence (spec-pinned): retrain + backfill over the maintained
   * index == a fresh bootstrap over the same vectors, bit-exact — the
   * trainers and the assigner are deterministic in row-set, not row-order.
   * Cost: O(index) by design — this is the deliberate periodic rebuild,
   * not the per-pass increment path.
   */
  def ivfRetrain(
      spark: SparkSession,
      indexDir: String,
      nLists: Int,
      kmeansIters: Int = 0,
      dryRun: Boolean = false): IvfRetrainReport = {
    import graft.operators.SimilarityIvf
    val centsPath = new Path(indexDir, "centroids")
    val assignPath = new Path(indexDir, "assignments")
    val fs = centsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(fs, centsPath)
    recoverDir(fs, assignPath)
    val listsBefore = spark.read.parquet(centsPath.toString).count()
    val vecs = spark.read.parquet(assignPath.toString).select("vec_id", "embedding")
    val cents2 =
      if (kmeansIters > 0) SimilarityIvf.kmeansCentroids(vecs, nLists, kmeansIters)
      else SimilarityIvf.centroids(vecs, nLists)
    if (dryRun)
      return IvfRetrainReport(dryRun = true, vecs.count(), listsBefore, cents2.count())
    val centsTmp = new Path(centsPath.toString + ".tmp")
    cents2.write.mode(SaveMode.Overwrite).parquet(centsTmp.toString)
    // backfill reads the STAGED centroids (not the still-live v1 dir) so the
    // assignment rewrite and the centroid swap agree on v2 geometry
    val assigned2 = SimilarityIvf.assign(vecs, spark.read.parquet(centsTmp.toString))
    val assignTmp = new Path(assignPath.toString + ".tmp")
    assigned2.write.mode(SaveMode.Overwrite).parquet(assignTmp.toString)
    val nVec = spark.read.parquet(assignTmp.toString).count()
    val nLists2 = spark.read.parquet(centsTmp.toString).count()
    swapDir(fs, centsTmp, centsPath)
    swapDir(fs, assignTmp, assignPath)
    IvfRetrainReport(dryRun = false, nVec, listsBefore, nLists2)
  }

  /** What one postings-index maintenance pass did (or would do).
    * `postingsRows` counts THIS PASS's rows (the bootstrap total or the
    * appended delta) — never a full-index count, which would put an
    * O(index) term into every O(increment) pass just for reporting. */
  case class PostingsReport(
      dryRun: Boolean,
      bootstrap: Boolean,
      docsBefore: Long,
      docsAfter: Long,
      postingsRows: Long) {
    def render: String =
      s"postings${if (dryRun) " (DRY RUN)" else ""}: " +
        s"${if (bootstrap) "bootstrapped" else "appended increment"}; " +
        s"docs $docsBefore -> $docsAfter, $postingsRows postings rows this pass"
  }

  /** Term-hash bucket for the maintained postings layout: 2 md5 hex chars
    * -> 64 buckets — the partition column query-time reads prune on. */
  private def termBucket(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    pmod(conv(substring(md5(term), 1, 2), 16, 10).cast("long"), lit(64L))
  }

  /**
   * Maintained BM25 POSTINGS index on the store — the lexical sibling of
   * [[ivfMaintain]] / [[scd2Maintain]]: `indexDir/postings` holds the full
   * inverted index `(term, doc_id, dl, tf)` PARTITIONED BY a 64-way term
   * hash bucket (`tb`), `indexDir/stats` the one-row `(n_docs, sum_dl)`
   * corpus stats. Bootstrap explodes the corpus once; every later pass
   * APPENDS the new docs' postings (postings are doc-local, so existing
   * rows are immutable — a pass costs O(increment), never O(index)) and
   * merges the stats by exact integer addition (staged + swapped, crash
   * windows auto-restored). At 100 TB this is how the retrieval family
   * avoids re-exploding the corpus per query batch: [[bm25Maintained]]
   * reads ONLY the query terms' buckets (partition pruning on `tb`), and
   * [[graft.operators.Search.bm25TopKFromPostings]] scores on that bounded
   * fetch.
   *
   * Contract: increment doc_ids must be NEW (keyed storage, not an upsert
   * target) — [[postingsAudit]] catches violations after the fact
   * (distinct doc_ids vs the stats row's accumulated n_docs).
   */
  def postingsMaintain(
      spark: SparkSession,
      indexDir: String,
      docs: org.apache.spark.sql.DataFrame,
      dryRun: Boolean = false): PostingsReport = {
    import org.apache.spark.sql.functions._
    val postingsPath = new Path(indexDir, "postings")
    val statsPath = new Path(indexDir, "stats")
    val fs = postingsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDir(fs, postingsPath)
    recoverDir(fs, statsPath)
    val words = split(col("text"), " ")
    val post = docs
      .select(col("doc_id"), size(words).cast("long").as("dl"), explode(words).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("tb", termBucket(col("term")))
    val delta = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(words).cast("long")).as("sum_dl")).head
    val (dN, dSum) = (delta.getLong(0), if (delta.isNullAt(1)) 0L else delta.getLong(1))
    val exists = fs.exists(statsPath)
    val before = if (exists) spark.read.parquet(statsPath.toString).head.getLong(0) else 0L
    if (dryRun)
      return PostingsReport(dryRun = true, bootstrap = !exists, before, before + dN, post.count())
    if (!exists) {
      post.write.mode(SaveMode.Overwrite).partitionBy("tb").parquet(postingsPath.toString)
      import spark.implicits._
      Seq((dN, dSum)).toDF("n_docs", "sum_dl")
        .write.mode(SaveMode.Overwrite).parquet(statsPath.toString)
      PostingsReport(dryRun = false, bootstrap = true, 0L, dN, post.count())
    } else {
      val prior = spark.read.parquet(statsPath.toString).head
      // one file per bucket per pass: an increment is small relative to the
      // index, and letting every shuffle partition write into every bucket
      // dir (up to partitions x 64 files) is exactly the small-files
      // pressure the census flags elsewhere
      post.repartition(col("tb"))
        .write.mode(SaveMode.Append).partitionBy("tb").parquet(postingsPath.toString)
      import spark.implicits._
      val statsTmp = new Path(statsPath.toString + ".tmp")
      Seq((prior.getLong(0) + dN, prior.getLong(1) + dSum)).toDF("n_docs", "sum_dl")
        .write.mode(SaveMode.Overwrite).parquet(statsTmp.toString)
      swapDir(fs, statsTmp, statsPath)
      PostingsReport(dryRun = false, bootstrap = false, prior.getLong(0),
        prior.getLong(0) + dN, post.count())
    }
  }

  /** [[postingsMaintain]] integrity audit: the stats row's accumulated
    * n_docs must equal the postings' distinct doc_id count — a re-appended
    * (duplicate) document inflates stats past the distinct set, a lost
    * append leaves stats ahead of the rows. One aggregate per side. */
  def postingsAudit(spark: SparkSession, indexDir: String): (Long, Long, Boolean) = {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(new Path(indexDir, "postings").toString)
      .agg(countDistinct(col("doc_id"))).head.getLong(0)
    val n = spark.read.parquet(new Path(indexDir, "stats").toString).head.getLong(0)
    (d, n, d == n)
  }

  /** BM25 top-k over a [[postingsMaintain]] index: the query terms' hash
    * buckets are computed driver-side (bounded by the query batch) and the
    * postings read filters on the `tb` PARTITION column — at 100 TB the
    * scan touches only the matching bucket directories (partition pruning),
    * never the full index. Scoring is the shared
    * [[graft.operators.Search.bm25TopKFromPostings]] — bit-identical to a
    * fresh batch [[graft.operators.Search.bm25TopK]] over the same corpus
    * (spec-pinned). */
  def bm25Maintained(spark: SparkSession, indexDir: String,
      queries: org.apache.spark.sql.DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val qTerms = queries
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val buckets = qTerms.select(termBucket(col("term")).as("tb")).distinct()
      .collect().map(_.getLong(0))
    val postings = spark.read.parquet(new Path(indexDir, "postings").toString)
      .where(col("tb").isin(buckets.toIndexedSeq: _*))
      .select("term", "doc_id", "dl", "tf")
    val stats = spark.read.parquet(new Path(indexDir, "stats").toString)
    graft.operators.Search.bm25TopKFromPostings(postings, stats, qTerms, k, k1, b)
  }

  /** [[ivfAudit]] verdict: row/distinct-vec_id counts (the increment
    * contract says vec_ids are NEW each pass, so n == distinctVecIds), plus
    * the list-id envelope of the assignments validated against the centroid
    * frame — null or out-of-range list_ids in a corrupted append show up as
    * `listIdsValid = false`. */
  case class IvfAuditReport(
      n: Long, distinctVecIds: Long, nullListIds: Long,
      minListId: Long, maxListId: Long,
      vecIdsUnique: Boolean, listIdsValid: Boolean) {
    def ok: Boolean = vecIdsUnique && listIdsValid
  }

  /** Periodic integrity audit for an [[ivfMaintain]] index: one aggregate
    * over the assignments (count, distinct vec_id, null/min/max list_id)
    * plus one tiny aggregate over the centroid frame — catches a violated
    * new-vec_ids contract or list-id corruption in an appended increment
    * after the fact, without putting an O(index) anti-join into every
    * increment's hot path. Run it on the maintenance cadence, not per
    * append. */
  def ivfAudit(spark: SparkSession, indexDir: String): IvfAuditReport = {
    import org.apache.spark.sql.functions._
    val a = spark.read.parquet(new Path(indexDir, "assignments").toString)
    val r = a.agg(count(lit(1)).as("n"), countDistinct(col("vec_id")).as("d"),
      sum(when(col("list_id").isNull, 1L).otherwise(0L)).as("nulls"),
      min(col("list_id")).cast("long").as("lo"),
      max(col("list_id")).cast("long").as("hi")).head
    val c = spark.read.parquet(new Path(indexDir, "centroids").toString)
      .agg(min(col("list_id")).cast("long").as("clo"),
        max(col("list_id")).cast("long").as("chi")).head
    val nulls = r.getLong(2)
    val (lo, hi) = (if (r.isNullAt(3)) 0L else r.getLong(3),
      if (r.isNullAt(4)) -1L else r.getLong(4))
    IvfAuditReport(r.getLong(0), r.getLong(1), nulls, lo, hi,
      vecIdsUnique = r.getLong(0) == r.getLong(1),
      listIdsValid = nulls == 0L &&
        (r.getLong(0) == 0L || (lo >= c.getLong(0) && hi <= c.getLong(1))))
  }

  private def partitionMetrics(spark: SparkSession, dataDir: String): Seq[String] = {
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("metric="))
      .map(n => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(n.stripPrefix("metric=")))
  }

  private def partitionDays(spark: SparkSession, dataDir: String, metric: String): Seq[String] = {
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter { s =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(s.getPath.getName.stripPrefix("metric=")) == metric
      }
      .flatMap(m => fs.listStatus(m.getPath).toSeq.map(_.getPath.getName))
      .filter(_.startsWith("dt="))
      .map(_.stripPrefix("dt="))
  }

  /** CLI: `Maintenance <dataDir> <metaDir> <ttlSpec> [nowMs] [--dry-run]`
    * where ttlSpec is `prefix=ttlMs,...` and must include `default`
    * (e.g. `default=2592000000,sys.err=3600000`). */
  def main(args: Array[String]): Unit = {
    val dryRun = args.contains("--dry-run")
    val rest = args.filterNot(_ == "--dry-run")
    require(rest.length >= 3, "usage: Maintenance <dataDir> <metaDir> <ttlSpec> [nowMs] [--dry-run]")
    val Array(dataDir, metaDir, ttlSpec) = rest.take(3)
    val nowMs = rest.lift(3).map(_.toLong).getOrElse(System.currentTimeMillis())
    val ttl = ttlSpec.split(",").map { kv =>
      val i = kv.lastIndexOf('=')
      require(i > 0, s"bad ttl entry: $kv")
      kv.substring(0, i) -> kv.substring(i + 1).toLong
    }.toMap
    require(ttl.contains("default"), "ttlSpec must include default=<ms>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      println(run(spark, dataDir, metaDir, ttl, nowMs, dryRun).render)
      // partition census: the visibility report a retention review reads
      // (hour gaps, bloated days, small-files pressure)
      println("census (metric, dt, hr_partitions, rows, hr_span, gaps, files/partition):")
      graft.sources.PointStore.census(spark, dataDir)
        .orderBy(org.apache.spark.sql.functions.col("metric"),
          org.apache.spark.sql.functions.col("dt"))
        .collect()
        .foreach { r =>
          println(s"  ${r.getAs[String]("metric")} ${r.getAs[Any]("dt")}: " +
            s"hrs=${r.getAs[Long]("n_hr_partitions")} rows=${r.getAs[Long]("n_rows")} " +
            s"span=${r.getAs[Long]("hr_min")}-${r.getAs[Long]("hr_max")} " +
            s"gaps=${r.getAs[Long]("hr_gaps")} " +
            f"filesPerPart=${r.getAs[Double]("files_per_partition")}%.1f")
        }
    } finally spark.stop()
  }
}
