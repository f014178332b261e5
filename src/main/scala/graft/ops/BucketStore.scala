package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The bucketed swap-store machinery shared by the persisted streaming
  * sinks ([[graft.streaming.StreamingSnapshot]],
  * [[graft.streaming.StreamingLedger]]): fixed `bucket=N` directories
  * published by the recoverable-rename protocol
  * ([[SwapRecovery]]), with layout properties pinned in sidecar files
  * at creation time. Single-sourced after the ledger's first review
  * pass found the two sinks had copy-pasted (and subtly diverged on —
  * the create-race guard) the same ~60 lines.
  *
  * Writer/reader split — the concurrency contract:
  *
  *   - WRITERS (each sink's `applyBatch`, which foreachBatch runs
  *     strictly serially) call [[recoverDebris]] first: destructive
  *     recovery (restore orphaned `.old`, drop `.staging`) is safe
  *     exactly because at most one writer exists.
  *   - READERS call [[liveBucketDirs]]: the same crash-consistent view
  *     (live buckets, plus an orphaned `.old` standing in for its
  *     missing live sibling) WITHOUT deleting anything — a reader that
  *     ran recovery could destroy a concurrently-running writer's
  *     staged data mid-swap (the documented read-while-streaming
  *     composition makes that race real, not theoretical).
  *
  * What concurrent reads guarantee — and what they don't: a read
  * NEVER corrupts the store or the writer, and each bucket it returns
  * is a published (pre- or post-swap) state. But the listing and the
  * Spark scan are not one atomic step, so a swap completing in
  * between can (a) make the read fail transiently (the chosen dir was
  * renamed away — retry) or (b) return a torn cross-bucket view
  * (batch N applied in one bucket, not yet in another). Readers
  * needing cross-bucket atomicity on a LEDGER store have
  * [[graft.streaming.StreamingLedger.readLedgerConsistent]] — a
  * validated-retry read made sound by the per-bucket `_applied`
  * watermarks publishing atomically with the data; snapshot stores
  * carry no version marker, so there the options remain a quiesced
  * store or a table format with a commit log — that isolation level
  * is what the snapshot sink trades away for plain directories.
  */
private[graft] object BucketStore {

  def readSidecar(fs: FileSystem, f: Path): Option[String] =
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim)
      finally in.close()
    }

  /** `overwrite = false` (the default for layout sidecars) makes a
    * creation race fail loudly instead of silently last-writer-wins. */
  def writeSidecar(fs: FileSystem, f: Path, v: String,
                   overwrite: Boolean = false): Unit = {
    val out = fs.create(f, overwrite)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }

  /** The bucket modulus is a LAYOUT property fixed when the store is
    * created: merging with a different modulus than the live dirs were
    * hashed with silently drops keys (merged rows re-bucket outside
    * the touched set and are discarded with the staging dir) and
    * duplicates others. First use persists `buckets` to a `_buckets`
    * sidecar; every later apply uses the stored value and IGNORES its
    * parameter. */
  def layoutBuckets(fs: FileSystem, root: Path, buckets: Int): Int =
    readSidecar(fs, new Path(root, "_buckets")) match {
      case Some(v) => v.toInt
      case None =>
        writeSidecar(fs, new Path(root, "_buckets"), buckets.toString)
        buckets
    }

  /** The key-column list (names AND order) is likewise a layout
    * property: the bucket hash is `xxhash64(keys...)`, so a later
    * apply with the same columns in a different order re-hashes
    * existing rows outside the touched set — the same silent-drop
    * failure mode as a modulus change. First use persists the list;
    * later applies must match it exactly. */
  def layoutKeys(fs: FileSystem, root: Path, keys: Seq[String]): Unit = {
    // the sidecar encoding (and fsck's split(",") re-parse) is only
    // injective for comma-free names — a column literally named "a,b"
    // would collide with the two-key list ["a","b"] and defeat the
    // exact guard this sidecar exists for
    require(keys.forall(!_.contains(",")),
      s"bucket-store key columns must not contain ',': $keys")
    val f = new Path(root, "_keys")
    readSidecar(fs, f) match {
      case Some(v) =>
        require(v == keys.mkString(","),
          s"store at $root was created with key columns [$v]; " +
            s"got [${keys.mkString(",")}] — key names and ORDER are a " +
            "creation-time layout property (they feed the bucket hash)")
      case None => writeSidecar(fs, f, keys.mkString(","))
    }
  }

  /** WRITER-side crash recovery: restore `.old` orphans
    * ([[SwapRecovery]]) and drop never-published `.staging`. Must not
    * be called from read paths — see the class doc. */
  def recoverDebris(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    SwapRecovery.restoreOldSiblings(fs, root)
    fs.listStatus(root)
      .filter(_.getPath.getName == ".staging")
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** READER-side listing: the store's crash-consistent contents
    * without touching the filesystem. Every live `bucket=N` dir, plus
    * any `bucket=N.old` whose live sibling is missing (a crash between
    * the two publish renames — the old data is authoritative until the
    * writer's next recovery). `.old` WITH a live sibling is a
    * completed swap: the live dir wins, the debris is ignored. */
  def liveBucketDirs(fs: FileSystem, root: Path): Seq[Path] = {
    if (!fs.exists(root)) return Seq.empty
    val names = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("bucket=")).toSet
    names.toSeq.sorted.flatMap {
      case n if n.endsWith(".old") =>
        if (names.contains(n.stripSuffix(".old"))) None
        else Some(new Path(root, n))
      case n => Some(new Path(root, n))
    }
  }

  /** Store integrity audit — the fsck a scheduler runs against a
    * persisted sink's directory before trusting it (or after an
    * incident): one bounded-digest row per check.
    *
    *   - `layout` / `layout_keys` — the `_buckets` / `_keys` sidecars
    *     exist and parse (fail/warn: without them the writer cannot
    *     guard the modulus/key-order layout properties);
    *   - `debris_old` / `debris_staging` — swap debris present (warn:
    *     normal between a crash and the writer's next recovery, or
    *     transiently while a swap is in flight — not corruption);
    *   - `bucket_range` — every bucket index parses and is < modulus
    *     (fail: a foreign or renamed dir would shadow real buckets);
    *   - `applied_watermarks` — ledger stores only: every live bucket
    *     carries a parseable `_applied` sidecar (fail: the replay
    *     gate treats a missing watermark as never-applied and would
    *     DOUBLE-APPLY a redelivered batch into that bucket — additive
    *     corruption, not idempotent redelivery);
    *   - `bucket_hash` — ONE distributed pass over all live rows
    *     recomputing `pmod(xxhash64(keys), B)` and counting rows that
    *     sit in the wrong directory (fail: misplaced rows are
    *     invisible to the touched-bucket merge and would never update
    *     or retract). The pass reads every row once — run it at audit
    *     cadence, not per batch.
    *
    * Statuses: `ok` | `warn` | `fail`. The check column keys the rows
    * for a vintage diff, same shape as the health report families. */
  def fsck(spark: org.apache.spark.sql.SparkSession,
           dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    if (!fs.exists(root))
      rows += (("layout", "fail", s"store dir missing: $dir"))
    else {
      // a sidecar read that THROWS (torn file on a checksummed FS) is
      // store corruption the audit must REPORT as a fail row — never
      // an abort, which HealthRun's NonFatal handler would demote to
      // a non-paging setup error and which would kill the whole
      // vintage report in Health.storeFsckReport
      def sidecar(name: String): Either[Throwable, Option[String]] =
        scala.util.Try(readSidecar(fs, new Path(root, name))).toEither
      val bucketsRead = sidecar("_buckets")
      val bOpt = bucketsRead.toOption.flatten
        .flatMap(v => scala.util.Try(v.toInt).toOption)
      rows += (bOpt match {
        case Some(b) => ("layout", "ok", s"buckets=$b")
        case None => ("layout", "fail", bucketsRead match {
          case Left(e) => s"_buckets sidecar unreadable (torn?): ${e.getMessage}"
          case _ => "_buckets sidecar missing or unparseable"
        })
      })
      val keysRead = sidecar("_keys")
      val keysOpt = keysRead.toOption.flatten.map(_.split(",").toSeq)
      rows += ((keysRead, keysOpt) match {
        case (_, Some(ks)) => ("layout_keys", "ok", ks.mkString(","))
        case (Left(e), _) => ("layout_keys", "fail",
          s"_keys sidecar unreadable (torn?): ${e.getMessage}")
        case _ => ("layout_keys", "warn",
          "_keys sidecar missing — key-order guard inactive (store predates it?)")
      })
      val names = fs.listStatus(root).map(_.getPath.getName)
      val olds = names.filter(n => n.startsWith("bucket=") && n.endsWith(".old"))
      rows += (("debris_old", if (olds.isEmpty) "ok" else "warn",
        if (olds.isEmpty) "none"
        else s"${olds.length} .old dir(s) pending writer recovery: ${olds.sorted.mkString(",")}"))
      rows += (("debris_staging",
        if (names.contains(".staging")) "warn" else "ok",
        if (names.contains(".staging"))
          ".staging present (swap in flight, or crash pending recovery)"
        else "none"))
      val liveNames = names
        .filter(n => n.startsWith("bucket=") && !n.endsWith(".old"))
      // ORPHANED .old dirs (live sibling missing) are authoritative:
      // liveBucketDirs serves their data to readers and the next
      // applyBatch restores them live — so range and watermark checks
      // must cover them, or a foreign/damaged orphan evades the audit
      // until the moment it goes live
      val orphanOlds = olds.filter(o =>
        !liveNames.contains(o.stripSuffix(".old")))
      val parsed = liveNames.map(n =>
        n -> scala.util.Try(n.stripPrefix("bucket=").toInt).toOption) ++
        orphanOlds.map(n => n -> scala.util.Try(
          n.stripPrefix("bucket=").stripSuffix(".old").toInt).toOption)
      val badNames = parsed.collect { case (n, None) => n }
      val outOfRange = bOpt.fold(Array.empty[String])(b =>
        parsed.collect { case (n, Some(i)) if i < 0 || i >= b => n })
      // two dirs parsing to the SAME index (bucket=01 beside bucket=1
      // after a sloppy restore) both pass the range check and both
      // hash clean — yet liveBucketDirs serves BOTH, double-counting
      // the bucket's rows for every reader (round-14 review)
      val aliased = parsed.collect { case (n, Some(i)) => (i, n) }
        .groupBy(_._1).filter(_._2.length > 1)
        .toSeq.sortBy(_._1)
        .map { case (i, ns) => s"$i<-[${ns.map(_._2).sorted.mkString(",")}]" }
      rows += (("bucket_range",
        if (badNames.isEmpty && outOfRange.isEmpty && aliased.isEmpty) "ok" else "fail",
        if (badNames.isEmpty && outOfRange.isEmpty && aliased.isEmpty)
          s"${liveNames.length} live bucket(s)" +
            (if (orphanOlds.nonEmpty) s" + ${orphanOlds.length} orphaned .old" else "")
        else s"unparseable: [${badNames.mkString(",")}] out-of-range: [${outOfRange.mkString(",")}]" +
          (if (aliased.nonEmpty) s" aliased: [${aliased.mkString(" ")}]" else "")))
      // exactly-once watermarks (ledger protocol only — a store with a
      // `_schema` sidecar): every live bucket must carry a parseable
      // `_applied`, because the replay gate treats a MISSING sidecar
      // as "never applied" (None.forall = true) and re-adds the
      // batch — for an ADDITIVE ledger that is silent double-count
      // corruption, not idempotent redelivery. Snapshot stores have
      // no watermarks (keep-latest is idempotent without them).
      val validLive = parsed.collect { case (n, Some(_)) => n }
      val schemaRead = sidecar("_schema")
      rows += (if (schemaRead.isLeft)
        ("applied_watermarks", "fail",
          "_schema sidecar unreadable (torn?) — cannot tell ledger " +
            "from snapshot; ledger replay safety is unverifiable")
      else if (schemaRead.toOption.flatten.isEmpty)
        ("applied_watermarks", "ok",
          "snapshot protocol — keep-latest needs no watermarks")
      else {
        val bad = validLive.filter { nm =>
          // Try around the READ too: on a checksummed FS a torn/
          // corrupt sidecar throws (ChecksumException) rather than
          // returning None — for the audit that is the same fail
          // class as missing/unparseable, not an abort. (The WRITER
          // deliberately does NOT catch this: a corrupt watermark
          // must crash the stream loudly, never read as "never
          // applied" and double-apply.)
          scala.util.Try(readSidecar(fs, new Path(root, s"$nm/_applied")))
            .toOption.flatten
            .flatMap(v => scala.util.Try(v.toLong).toOption).isEmpty &&
          // ...but a bucket whose DIR vanished between the listing
          // and this read is a swap in flight (live → .old mid-
          // rename), the exact transient the debris checks grade
          // warn — a false corruption page, not a lost watermark
          fs.exists(new Path(root, nm))
        }
        if (bad.isEmpty)
          ("applied_watermarks", "ok", s"${validLive.length} bucket watermark(s)")
        else ("applied_watermarks", "fail",
          s"missing/unparseable _applied in: ${bad.sorted.mkString(",")}" +
            " — a replayed batch would double-apply there")
      })
      (bOpt, keysOpt) match {
        case (Some(b), Some(ks)) =>
          val dirs = liveBucketDirs(fs, root)
          if (dirs.isEmpty)
            rows += (("bucket_hash", "ok", "no data yet"))
          else {
            // torn/unparseable _schema → fall back to inference for
            // the hash recount (the applied_watermarks row already
            // failed on the corruption itself); reuse the sidecar
            // read captured above rather than a second FS round-trip
            val schemaOpt = schemaRead.toOption.flatten
              .flatMap(v => scala.util.Try(
                org.apache.spark.sql.types.StructType.fromDDL(v)).toOption)
            // the recount itself must be TOTAL (round-14 review): a
            // corrupt-but-readable _keys sidecar (or data files that
            // no longer carry a listed key column) makes the select
            // throw UNRESOLVED_COLUMN — report-don't-abort means that
            // is a fail row, never an AnalysisException that kills
            // the whole vintage report
            val misplaced = scala.util.Try(
              schemaOpt.fold(spark.read)(spark.read.schema)
                .parquet(dirs.map(_.toString): _*)
                .select(
                  pmod(xxhash64(ks.map(col): _*), lit(b)).cast("int").as("expect"),
                  // anchored to the file's PARENT segment: a store
                  // rooted under a path that itself contains a
                  // bucket=N component (e.g. a dataset partitioned by
                  // a column named `bucket`) must not match the outer
                  // segment and brand every row misplaced; the
                  // optional .old covers an orphaned dir standing in
                  // for its missing live sibling (liveBucketDirs)
                  regexp_extract(input_file_name(),
                    "bucket=([0-9]+)(\\.old)?/[^/]*$", 1)
                    .cast("int").as("actual"))
                .filter(col("expect") =!= col("actual"))
                .count())
            rows += (misplaced match {
              case scala.util.Success(0L) =>
                ("bucket_hash", "ok", "all rows in their hash bucket")
              case scala.util.Success(m) =>
                ("bucket_hash", "fail",
                  s"$m row(s) in the wrong bucket dir — invisible to touched-bucket merges")
              case scala.util.Failure(e) =>
                ("bucket_hash", "fail",
                  s"recount failed — _keys don't resolve against the data " +
                    s"(corrupt sidecar or schema drift): ${e.getMessage.linesIterator.next()}")
            })
          }
        case _ =>
          rows += (("bucket_hash", "warn",
            "skipped — needs both _buckets and _keys sidecars"))
      }
    }
    import spark.implicits._
    rows.toSeq.toDF("check", "status", "detail")
  }

  /** Publishes staged bucket dirs with the recoverable-rename
    * sequence (live → `.old`, staged → live, drop `.old`), then drops
    * the staging dir. Callers stage everything — including any
    * per-bucket sidecars that must publish atomically with the data —
    * before calling. */
  def swapIn(fs: FileSystem, root: Path, staging: Path,
             buckets: Seq[Int]): Unit = {
    buckets.foreach { bk =>
      val live = new Path(root, s"bucket=$bk")
      val old = new Path(root, s"bucket=$bk.old")
      val staged = new Path(staging, s"bucket=$bk")
      if (fs.exists(live))
        require(fs.rename(live, old), s"swap failed: $live -> $old")
      require(fs.rename(staged, live), s"swap failed: $staged -> $live")
      fs.delete(old, true)
    }
    fs.delete(staging, true)
    ()
  }
}
