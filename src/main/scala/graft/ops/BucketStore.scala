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
  * needing cross-bucket atomicity should read a quiesced store or use
  * a table format with a commit log — that isolation level is exactly
  * what these sinks trade away for plain directories.
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
