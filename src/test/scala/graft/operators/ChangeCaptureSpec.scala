package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The expose_cdf incremental machinery (reference
  * `terminators/cdf_processor.py:100-112` models this as a checkpointed
  * streaming read; here the checkpoint is a version sidecar). The Delta
  * read itself needs jars this sandbox lacks, but the crash-safety-
  * critical pieces — starting-version precedence and the sidecar write —
  * are Delta-independent and tested here directly. The parquet-path
  * expose end-to-end lives in AlgorithmsSpec/DataLoaderSpec. */
class ChangeCaptureSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("nextStartingVersion: sidecar wins after the first expose") {
    // first-ever expose, nothing pinned: whole history
    assert(ChangeCapture.nextStartingVersion(None, None) == 0L)
    // first expose with a pinned starting_version: the pin seeds it
    assert(ChangeCapture.nextStartingVersion(Some(5L), None) == 5L)
    // subsequent exposes: one past the last exposed version
    assert(ChangeCapture.nextStartingVersion(None, Some(7L)) == 8L)
    // an ACON that KEEPS starting_version set (normal for a deployed
    // pipeline) must not rewind: the sidecar wins over the pin
    assert(ChangeCapture.nextStartingVersion(Some(5L), Some(7L)) == 8L)
    // even a pin AHEAD of the sidecar does not skip: checkpoint semantics
    assert(ChangeCapture.nextStartingVersion(Some(20L), Some(7L)) == 8L)
  }

  test("version sidecar: read missing, write, read back, overwrite") {
    val loc = tmpDir("cdf-sidecar") + "/state"
    assert(ChangeCapture.readVersionSidecar(conf, loc).isEmpty)
    ChangeCapture.writeVersionSidecar(conf, loc, 3L)
    assert(ChangeCapture.readVersionSidecar(conf, loc).contains(3L))
    // advancing overwrites in place (OVERWRITE rename, no delete window)
    ChangeCapture.writeVersionSidecar(conf, loc, 9L)
    assert(ChangeCapture.readVersionSidecar(conf, loc).contains(9L))
    // no stage residue left behind
    val stage = new Path(loc + "__version.stage")
    assert(!stage.getFileSystem(conf).exists(stage))
  }

  test("sidecar write survives a pre-existing target (no delete window)") {
    val loc = tmpDir("cdf-sidecar2") + "/state"
    ChangeCapture.writeVersionSidecar(conf, loc, 1L)
    ChangeCapture.writeVersionSidecar(conf, loc, 2L)
    ChangeCapture.writeVersionSidecar(conf, loc, 3L)
    assert(ChangeCapture.readVersionSidecar(conf, loc).contains(3L))
  }

  test("expose choreography: first / second / nothing-new / pinned runs") {
    // Simulates the delta-branch control flow of exposeCdf against the
    // real sidecar helpers: run N reads (nextStart(explicit, sidecar),
    // latest], appends, then records latest.
    val loc = tmpDir("cdf-choreo") + "/state"
    val pinned = Some(2L) // the ACON keeps starting_version=2 forever
    def runOnce(latest: Long): Option[(Long, Long)] = {
      val start = ChangeCapture.nextStartingVersion(
        pinned, ChangeCapture.readVersionSidecar(conf, loc))
      if (start > latest) None // nothing new: skip read+append
      else {
        ChangeCapture.writeVersionSidecar(conf, loc, latest)
        Some(start -> latest)
      }
    }
    // first expose at latest=5: the pin seeds the range
    assert(runOnce(5L).contains(2L -> 5L))
    // second expose at latest=8: sidecar wins over the still-set pin
    assert(runOnce(8L).contains(6L -> 8L))
    // nothing committed since: skipped, sidecar unchanged
    assert(runOnce(8L).isEmpty)
    assert(ChangeCapture.readVersionSidecar(conf, loc).contains(8L))
    // more commits arrive: resumes exactly one past the watermark
    assert(runOnce(11L).contains(9L -> 11L))
    // emitted ranges tile (no gap, no overlap): 2..5, 6..8, 9..11
  }
}
