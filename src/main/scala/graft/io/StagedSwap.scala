package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Checked staged-swap commit for whole-directory rewrites (merge,
  * delete-where, compaction, control-table update, GAB insights).
  *
  * Protocol: the caller writes the new contents to `<location>__stage`
  * (or any sibling staging dir) and calls [[commit]]. The swap is NOT
  * atomic — Hadoop `FileSystem.rename` is per-path and returns `false`
  * on failure instead of throwing — so this helper:
  *
  *   1. recovers a previous crashed swap first (live missing + `__old`
  *      present → restore `__old` as live before proceeding);
  *   2. asserts every `rename` returned `true`, throwing otherwise;
  *   3. if `stage → live` fails after `live → old` succeeded, rolls the
  *      old data back into place before throwing, so the target is never
  *      left missing;
  *   4. deletes `__old` only after verifying the new live path exists.
  *
  * Readers racing the swap can still observe a missing path between the
  * two renames (documented crash window); on a real lakehouse this is the
  * job of a transaction log, which this build intentionally does not have.
  */
object StagedSwap {

  /** Swap `stage` into place at `location`, keeping the previous contents
    * at `<location>__old` until the swap is verified. Throws (and restores
    * the previous contents when possible) on any failed rename.
    */
  def commit(conf: Configuration, location: String, stage: String): Unit = {
    val live = new Path(location.stripSuffix("/"))
    val fs = live.getFileSystem(conf)
    val old = new Path(location.stripSuffix("/") + "__old")
    val stagePath = new Path(stage.stripSuffix("/"))
    require(fs.exists(stagePath), s"staged-swap: stage dir $stagePath does not exist")

    // Recover a crash between the two renames of a previous swap.
    if (!fs.exists(live) && fs.exists(old)) {
      require(fs.rename(old, live), s"staged-swap: crash recovery rename $old -> $live failed")
    }
    fs.delete(old, true)

    val hadLive = fs.exists(live)
    if (hadLive)
      require(fs.rename(live, old), s"staged-swap: rename $live -> $old failed")
    if (!fs.rename(stagePath, live)) {
      // Put the previous contents back before failing, so the target is
      // never left missing by a failed swap.
      if (hadLive) fs.rename(old, live)
      sys.error(s"staged-swap: rename $stagePath -> $live failed" +
        (if (hadLive) s" (previous contents restored from $old)" else ""))
    }
    require(fs.exists(live), s"staged-swap: $live missing after commit")
    fs.delete(old, true)
  }
}
