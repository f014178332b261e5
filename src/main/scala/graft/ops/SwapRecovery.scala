package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** The recoverable-rename contract shared by the IVF list compaction
  * ([[Ivf.compactIndex]]) and the streaming snapshot sink
  * ([[graft.streaming.StreamingSnapshot]]): a live directory is
  * replaced by renaming it to `<name>.old`, renaming the staged
  * replacement in, then dropping the `.old`. This is the recovery
  * half both swappers run first, single-sourced so the two cannot
  * drift: a `.old` WITHOUT its live sibling marks a crash between the
  * two renames — the old data is authoritative, restore it; WITH a
  * live sibling the swap completed — drop it. Staging sweeps stay
  * with each caller (their naming differs: per-list `.compact`
  * siblings vs one `.staging` dir). Callers gate on
  * [[Ivf.atomicRenameScheme]] — on a copy+delete filesystem the
  * restore rename would itself tear. */
private[graft] object SwapRecovery {

  def restoreOldSiblings(fs: FileSystem, root: Path): Unit =
    fs.listStatus(root)
      .filter(_.getPath.getName.endsWith(".old"))
      .foreach { o =>
        val live = new Path(root, o.getPath.getName.stripSuffix(".old"))
        if (!fs.exists(live))
          require(fs.rename(o.getPath, live),
            s"crash recovery failed: ${o.getPath} -> $live")
        else fs.delete(o.getPath, true)
      }
}
