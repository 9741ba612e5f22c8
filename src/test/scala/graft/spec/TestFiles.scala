package graft.spec

/** Shared recursive file walks for the conformance sweeps (AconSweepSpec
  * over the reference test resources, DocAconSweepSpec over the usage
  * docs) — one sorted, extension-filtered traversal instead of a copy
  * per sweep. */
object TestFiles {
  def walk(f: java.io.File, ext: String): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk(_, ext))
    else if (f.getName.endsWith(ext)) Seq(f)
    else Seq.empty
}
