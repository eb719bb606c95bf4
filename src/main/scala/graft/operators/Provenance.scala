package graft.operators

import graft.CacheLifecycle.FreshPersist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-level lineage and data-skipping statistics.
  *
  * `fileManifest` computes, per source file, the row count and
  * min/max of chosen columns — the manifest a lakehouse table format
  * keeps so queries can skip files whose [min,max] excludes the
  * predicate. The file identity comes from the scan's `_metadata`
  * struct (constant-folded per file by the reader, not parsed per
  * row); the aggregation shuffles one row per (file, stats) group.
  *
  * At 100 TB the manifest is computed incrementally per newly-landed
  * file and unioned into a stats table; the per-file computation here
  * is exactly that increment.
  */
object Provenance {

  /** Per-file `(file_path, file_name, n_rows, min_<c>, max_<c>...)`.
    * The input must be a file-source DataFrame (fresh `spark.read`
    * result) — `_metadata` is a scan column and does not survive
    * arbitrary upstream transforms. Grouping keys on the FULL path:
    * a partitioned write puts identically-named part files into every
    * partition directory (one task, one basename, many dirs), so the
    * basename alone silently merges distinct files; it rides along
    * for display only.
    */
  def fileManifest(df: DataFrame, statCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.select(
        (col("_metadata.file_path").as("file_path") +: statCols.map(col)): _*)
      .groupBy(col("file_path"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("file_name", regexp_extract(col("file_path"), "([^/]+)$", 1))
  }

  /** Rows of `df` whose file's [min,max] envelope on `statCol` can
    * contain `value` — the skip-check a reader would run against the
    * manifest. Exposed mostly for the spec that proves manifest
    * envelopes are sound (every matching row's file survives).
    */
  def filesPossiblyContaining(
      manifest: DataFrame, statCol: String, value: Column): DataFrame =
    manifest.filter(value >= col(s"min_$statCol") && value <= col(s"max_$statCol"))

  /** Predicted scan cost of a range predicate `[lo, hi]` on
    * `statCol`, answered from the manifest alone — the zone-map
    * skipping arithmetic a reader runs BEFORE touching data. One
    * row: file/row totals, how many survive the envelope overlap
    * test (`max ≥ lo AND min ≤ hi`), and the skipped fractions.
    *
    * This is the planning complement of [[graft.operators.Layout]]:
    * run it against the manifests of two candidate layouts and the
    * skip fractions ARE the layout decision — a clustered layout
    * shows ~range/span of rows scanned, an unclustered one shows
    * every file surviving because each envelope spans the whole
    * domain. Cost: one aggregate over manifest rows (files, not
    * data) — at 100 TB this is the table you can afford to consult
    * per query.
    *
    * The envelope test is conservative by construction (a surviving
    * file may still contain no matching rows; a skipped one provably
    * cannot), so `n_rows_scanned` upper-bounds the true matching
    * rows — the same soundness contract as
    * [[filesPossiblyContaining]].
    */
  def pruningEstimate(
      manifest: DataFrame, statCol: String, lo: Column, hi: Column): DataFrame = {
    val hit = col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi
    manifest
      .agg(
        count(lit(1)).as("n_files"),
        sum(when(hit, lit(1L)).otherwise(lit(0L))).as("n_files_scanned"),
        sum(col("n_rows")).as("n_rows_total"),
        sum(when(hit, col("n_rows")).otherwise(lit(0L))).as("n_rows_scanned"))
      .withColumn("file_skip_fraction",
        when(col("n_files") > 0,
          lit(1.0) - col("n_files_scanned").cast("double")
            / col("n_files").cast("double")))
      .withColumn("row_skip_fraction",
        when(col("n_rows_total") > 0,
          lit(1.0) - col("n_rows_scanned").cast("double")
            / col("n_rows_total").cast("double")))
  }

  /** Takedown / right-to-be-forgotten plan: given a manifest of ids
    * to purge (opt-out lists, DMCA notices, consent revocations),
    * report which physical files are impacted and how hard — the
    * file-level rewrite set for an immutable-format delete. Output:
    * one row per IMPACTED file — (file_path, file_name, n_rows,
    * n_hit, hit_fraction); untouched files don't appear (they are
    * exactly the files a rewrite job must NOT touch).
    *
    * One scan, one shuffle keyed on file identity: the takedown
    * manifest broadcasts (opt-out lists are manifest-scale, orders of
    * magnitude under the corpus — for a takedown so large it rivals
    * the corpus, filter-and-rewrite everything instead of planning),
    * rows carry only (file_path, id) into the aggregate, and the
    * hit/total counts come from one conditional aggregation. Like
    * [[fileManifest]], `df` must be a fresh file-source read —
    * `_metadata` is a scan column.
    */
  def takedownPlan(df: DataFrame, idCol: String, takedown: DataFrame): DataFrame = {
    val hits = takedown.select(col(idCol)).distinct().withColumn("_hit", lit(1L))
    df.select(col("_metadata.file_path").as("file_path"), col(idCol))
      .join(broadcast(hits), Seq(idCol), "left")
      .groupBy(col("file_path"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_hit"))
      .filter(col("n_hit") > 0)
      .withColumn("hit_fraction",
        col("n_hit").cast("double") / col("n_rows").cast("double"))
      .withColumn("file_name", regexp_extract(col("file_path"), "([^/]+)$", 1))
  }

  /** Outcome of [[takedownExecute]], verified before return: a caller
    * holding a report knows `outDir` is safe to swap in. */
  final case class TakedownReport(
      filesCarried: Long, filesRewritten: Long,
      rowsBefore: Long, rowsDropped: Long, rowsAfter: Long)

  /** Execute a [[takedownPlan]]: the write-new / verify half of the
    * versioned write-new → verify → swap cycle (the keep-list fold's
    * versioned-parquet discipline applied to deletion). Files with NO
    * hits are carried into `outDir` as BYTE-IDENTICAL filesystem
    * copies — their parquet encodings, stats, and bytes untouched, so
    * the rewrite cost scales with the hit FRACTION of the corpus, not
    * its size (the takedownPlan's point); files with hits are re-read
    * with exactly the taken-down ids anti-joined out and rewritten.
    *
    * The input dir is NEVER modified: an in-flight reader of the old
    * version keeps every file it bound at plan time (no
    * overwrite-while-reading), and the swap is a pointer flip the
    * caller performs only after this returns — which it does only
    * after verifying (a) rowsAfter == rowsBefore − dropped and (b) a
    * read-back probe finds zero taken-down ids in `outDir`. In-place
    * execution (`outDir == dir`, however aliased) is refused loudly,
    * the [[compact]] guard.
    *
    * Partitioned layouts are preserved: carried files land under
    * their INPUT-RELATIVE paths in `outDir` (a flat carry keyed on
    * bare file name would silently overwrite colliding part files
    * and drop the partition columns from the output), and hit files
    * rewrite as ONE Spark job — a `basePath` read reconstructs the
    * partition-column values from the directory names (so `idCol`
    * may itself be a partition column) and a single `partitionBy`
    * append recreates the layout. Rewrite cost therefore scales with
    * hit bytes, never with the number of impacted partition
    * directories.
    */
  def takedownExecute(
      spark: org.apache.spark.sql.SparkSession, dir: String, outDir: String,
      idCol: String, takedown: DataFrame): TakedownReport = {
    val conf = spark.sparkContext.hadoopConfiguration
    val inPath = new org.apache.hadoop.fs.Path(dir)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val qIn = inPath.getFileSystem(conf).makeQualified(inPath).toUri.normalize()
    val qOut = outPath.getFileSystem(conf).makeQualified(outPath).toUri.normalize()
    require(qIn != qOut,
      "in-place takedown is refused: write side-by-side, verify, then swap")
    val ids = takedown.select(col(idCol)).distinct().persistFresh()
    try {
      val df = spark.read.parquet(dir)
      // compare by URI path component: _metadata.file_path and the
      // filesystem listing may render the same file with different
      // scheme spellings (file:/ vs file:///)
      def pathKey(s: String) =
        new org.apache.hadoop.fs.Path(s).toUri.getPath
      // input-relative path of a leaf file: the suffix below the
      // qualified input root — "" prefix stripping is safe because the
      // recursive listing only yields paths under qIn
      val rootKey = {
        val k = qIn.getPath
        if (k.endsWith("/")) k else k + "/"
      }
      def relKey(s: String): String = {
        val k = pathKey(s)
        require(k.startsWith(rootKey), s"listed file $k escapes input root $rootKey")
        k.substring(rootKey.length)
      }
      val hitPaths = takedownPlan(df, idCol, ids)
        .select(col("file_path")).collect().map(r => pathKey(r.getString(0))).toSet
      val fs = inPath.getFileSystem(conf)
      val it = fs.listFiles(inPath, true)
      val all = Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter { f =>
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }.map(_.getPath).toSeq
      // layout-uniformity guard: the partition-column inference below
      // diffs ONE leaf footer against the basePath schema, which is
      // only sound when every data file sits at the same partition
      // depth with the same directory keys. A mixed flat+partitioned
      // (or depth-divergent) input would make that diff — and Spark's
      // partition discovery — guess; refuse loudly BEFORE any file is
      // copied rather than mis-infer a layout.
      val layouts = all.map { p =>
        relKey(p.toString).split('/').dropRight(1)
          .map(seg => seg.takeWhile(_ != '=')).toSeq
      }.distinct
      require(layouts.size <= 1,
        s"mixed partition layouts under $dir (" +
          layouts.map(l => if (l.isEmpty) "<flat>" else l.mkString("/"))
            .mkString(" vs ") +
          ") — refusing takedown; compact the table to one layout first")
      val (hit, carried) = all.partition(p => hitPaths.contains(pathKey(p.toString)))
      require(hit.size == hitPaths.size,
        s"takedown plan named ${hitPaths.size} files but the listing matched ${hit.size}")
      val outFs = outPath.getFileSystem(conf)
      outFs.mkdirs(outPath)
      carried.foreach { p =>
        val dest = new org.apache.hadoop.fs.Path(outPath, relKey(p.toString))
        outFs.mkdirs(dest.getParent)
        org.apache.hadoop.fs.FileUtil.copy(fs, p, outFs, dest, false, conf)
      }
      // rewrite hit files as ONE job: the basePath read reconstructs
      // partition-column values from the directory names (so a
      // takedown keyed on a partition column works too), and a single
      // partitionBy append recreates the layout under outDir — cost
      // scales with hit BYTES, not hit-directory count (a takedown
      // touching one row in each of 5000 partition dirs must not pay
      // 5000 job submissions)
      if (hit.nonEmpty) {
        val hitDf = spark.read.option("basePath", dir)
          .parquet(hit.map(_.toString): _*)
        // partition columns = basePath schema minus one leaf's file
        // schema (one footer read — cheap); empty for a flat layout
        val partCols = hitDf.columns.toSeq
          .diff(spark.read.parquet(hit.head.toString).columns.toSeq)
        val cleaned = hitDf.join(broadcast(ids), Seq(idCol), "left_anti")
        if (partCols.isEmpty) cleaned.write.mode("append").parquet(outDir)
        else cleaned.write.partitionBy(partCols: _*)
          .mode("append").parquet(outDir)
      }
      // verification before anyone swaps: exact row accounting and a
      // zero-survivors probe of the taken-down ids
      val rowsBefore = df.count()
      val dropped = df.join(broadcast(ids), Seq(idCol), "left_semi").count()
      val after = spark.read.parquet(outDir)
      val rowsAfter = after.count()
      require(rowsAfter == rowsBefore - dropped,
        s"takedown rewrite row mismatch: $rowsBefore before, $dropped to drop, " +
          s"$rowsAfter after — do NOT swap $outDir in")
      val survivors = after.join(broadcast(ids), Seq(idCol), "left_semi").count()
      require(survivors == 0L,
        s"$survivors taken-down rows survive in $outDir — do NOT swap it in")
      TakedownReport(carried.size.toLong, hit.size.toLong,
        rowsBefore, dropped, rowsAfter)
    } finally ids.unpersist(blocking = false)
  }

  /** Small-files compaction plan: assign every physical file of a
    * parquet layout to a rewrite group totaling ~`targetBytes` — the
    * maintenance pass that keeps a streamed-into / trickle-appended
    * table's file count sane. Pure composition: the file census comes
    * from `_metadata` (path + size, one row per file), group
    * assignment from [[Packing.packBySizeBudget]] over the census —
    * so it inherits packing's guarantees (each group overflows the
    * target by at most one file; `shards` groups files in parallel).
    * Output: (file_path, size_bytes, shard, pack_id, pack_pos); a
    * rewrite job coalesces each (shard, pack_id) group.
    */
  def compactionPlan(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long, shards: Int = 16): DataFrame = {
    import spark.implicits._
    // the census is a FILESYSTEM listing, not a table scan: (path,
    // length) comes from directory metadata in seconds — projecting
    // _metadata per row would read every row of the table to answer a
    // file-count question. File lists are driver-scale (1e5–1e6
    // entries at 100 TB — the same order every Spark read already
    // lists into its file index).
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter { f =>
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .map(f => (f.getPath.toString, f.getLen))
      .toSeq
    val census = files.toDF("file_path", "size_bytes")
    Packing.packBySizeBudget(census, "file_path", "size_bytes", targetBytes, shards)
  }

  /** Outcome of [[compact]], verified by read-back (the S9 sink
    * discipline): the row counts are REQUIRED equal before this
    * returns, so a caller holding a report knows the rewrite is safe
    * to swap in.
    */
  final case class CompactionReport(
      nGroups: Int, filesBefore: Long, filesAfter: Long, rowsTotal: Long)

  /** Execute a [[compactionPlan]]: rewrite each (shard, pack_id)
    * group of small files as one coalesced file in `outDir`, then
    * verify the row count survived. The write is side-by-side, never
    * in place — compaction of an immutable layout is write-new,
    * verify, atomically swap (rename/pointer-flip), exactly like the
    * drop-and-replace sink discipline; an in-place rewrite that dies
    * midway loses data, so `outDir == dir` is refused loudly.
    *
    * Each group is one small job: read exactly that group's files,
    * `coalesce(1)`, append one part-file to `outDir`. Jobs are
    * driver-looped over a config-sized group list (the plan is
    * file-census-scale) and deliberately SEQUENTIAL: concurrent
    * append jobs into one directory race on the file committer's
    * shared `_temporary` staging area (a finishing job's cleanup can
    * delete a running job's staged files). For overlap, write each
    * group to its own subdirectory (or use a staging-free committer)
    * and move the part-files after — the per-group read is already
    * cluster-parallel either way, so the loop bounds only job-submit
    * latency, not data parallelism. Flat layouts only: for a
    * partitioned table, run per partition directory (explicit leaf
    * file reads do not reconstruct partition-column values).
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, dir: String, outDir: String,
      targetBytes: Long, shards: Int = 16): CompactionReport = {
    val inPath = new org.apache.hadoop.fs.Path(dir)
    val canonicalOut = new org.apache.hadoop.fs.Path(outDir)
    // qualify + normalize before comparing: "/a/b/../b" or a bare
    // scheme difference must not slip an in-place rewrite past the
    // guard
    val conf = spark.sparkContext.hadoopConfiguration
    val qIn = inPath.getFileSystem(conf).makeQualified(inPath).toUri.normalize()
    val qOut = canonicalOut.getFileSystem(conf).makeQualified(canonicalOut)
      .toUri.normalize()
    require(qIn != qOut,
      "in-place compaction is refused: write side-by-side, verify, then swap")
    val plan = compactionPlan(spark, dir, targetBytes, shards)
      .select(col("file_path"), col("shard"), col("pack_id"))
      .collect()
      .map(r => (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("pack_id")))
        -> r.getString(r.fieldIndex("file_path")))
    val groups = plan.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (g, fs) => g -> fs.map(_._2).sorted.toSeq }
    groups.foreach { case (_, paths) =>
      spark.read.parquet(paths: _*)
        .coalesce(1)
        .write.mode("append").parquet(outDir)
    }
    // read-back verification: the rewrite preserved every row
    val rowsBefore = spark.read.parquet(dir).count()
    val rowsAfter = spark.read.parquet(outDir).count()
    require(rowsAfter == rowsBefore,
      s"compaction dropped rows: $rowsBefore in, $rowsAfter out — do NOT swap $outDir in")
    val fs = canonicalOut.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(canonicalOut, true)
    val filesAfter = Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .count { f =>
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
    CompactionReport(groups.size, plan.length.toLong, filesAfter.toLong, rowsAfter)
  }
}
