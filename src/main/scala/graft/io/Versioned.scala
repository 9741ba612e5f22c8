package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Versioned whole-directory commits: the OSS-parquet analogue of Delta's
  * version history, sized for the one reference behavior that needs it —
  * `DQValidator`'s restore-to-previous-version on failed validations
  * (`algorithms/dq_validator.py:154-169`).
  *
  * Layout: the live data at `<location>`, archived generations at
  * `<location>__v<N>` (ascending). [[commit]] archives the current live
  * directory as the next version before swapping the stage in (pruning to
  * `keepVersions`); [[restorePrevious]] archives the current (bad) live
  * as a new version and renames the latest archive back into place — so,
  * like Delta's RESTORE, the rolled-back state remains in history.
  * Rename-based like [[StagedSwap]], with the same non-atomicity caveat.
  */
object Versioned {

  private def versionPath(location: String, n: Int): Path =
    new Path(location.stripSuffix("/") + s"__v$n")

  /** Existing archived versions of THIS location, ascending by number. */
  def versions(conf: Configuration, location: String): Seq[Int] = {
    val live = new Path(location.stripSuffix("/"))
    val fs = live.getFileSystem(conf)
    val parent = live.getParent
    val prefix = live.getName + "__v"
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) &&
          n.length > prefix.length && n.drop(prefix.length).forall(_.isDigit) =>
        n.drop(prefix.length).toInt }
      .sorted
  }

  /** Swap `stage` into place at `location`, archiving the previous live
    * contents as the next version and pruning old versions. */
  def commit(conf: Configuration, location: String, stage: String,
      keepVersions: Int = 2): Unit = {
    val live = new Path(location.stripSuffix("/"))
    val fs = live.getFileSystem(conf)
    val stagePath = new Path(stage.stripSuffix("/"))
    require(fs.exists(stagePath), s"versioned commit: stage $stagePath missing")
    if (fs.exists(live)) {
      // A stray quarantine marker can only be left by a restore whose
      // archive rename failed mid-flight; this live data is being
      // committed over, so it must not poison the archive as quarantined.
      fs.delete(new Path(live, QuarantineMarker), false)
      val next = versions(conf, location).lastOption.getOrElse(0) + 1
      require(fs.rename(live, versionPath(location, next)),
        s"versioned commit: archive $live -> v$next failed")
    }
    require(fs.rename(stagePath, live),
      s"versioned commit: rename $stagePath -> $live failed")
    val vs = versions(conf, location)
    vs.dropRight(keepVersions).foreach(n => fs.delete(versionPath(location, n), true))
  }

  /** Write a DataFrame as the new live version (archive-then-swap). */
  def write(df: DataFrame, location: String, keepVersions: Int = 2): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val stage = location.stripSuffix("/") + "__stage"
    df.write.mode("overwrite").parquet(stage)
    commit(conf, location, stage, keepVersions)
  }

  /** Marker dropped into an archive created BY a restore (the quarantined
    * bad live data), so a second restore never puts it back in place. */
  private val QuarantineMarker = "_QUARANTINED"

  private def isQuarantined(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, QuarantineMarker))

  /** Roll the live directory back to the most recent archived GOOD version;
    * the rolled-back (bad) live contents are kept as a new version, like
    * Delta RESTORE, but tagged with a quarantine marker: calling
    * restorePrevious again walks further back through history instead of
    * restoring the bad data that was just rolled back. Returns the
    * restored version number. */
  def restorePrevious(conf: Configuration, location: String): Int = {
    val live = new Path(location.stripSuffix("/"))
    val fs = live.getFileSystem(conf)
    val vs = versions(conf, location)
    val good = vs.filterNot(n => isQuarantined(fs, versionPath(location, n)))
    require(good.nonEmpty,
      s"restore: no archived non-quarantined versions for $location " +
        s"(${vs.size} total, ${vs.size - good.size} quarantined)")
    val target = good.last
    if (fs.exists(live)) {
      val next = vs.last.max(target) + 1
      val quarantined = versionPath(location, next)
      // Marker goes INTO the (bad) live dir BEFORE the rename: written
      // after, a crash between rename and marker would leave the bad data
      // as the newest unmarked version — exactly what the next restore
      // would then re-instate. Underscore-prefixed, so readers ignore it.
      fs.create(new Path(live, QuarantineMarker)).close()
      require(fs.rename(live, quarantined),
        s"restore: archive of current live as v$next failed")
    }
    require(fs.rename(versionPath(location, target), live),
      s"restore: rename v$target -> $live failed")
    target
  }
}
