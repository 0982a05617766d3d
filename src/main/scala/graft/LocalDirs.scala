package graft

/** Shuffle/spill directory selection for the single-node harness.
  *
  * The sandbox's root filesystem is a throttled virtual disk: stack
  * samples of the triangle close at sf1 showed executor threads
  * dominated by `FileOutputStream.write`/`UnixFileSystem.delete`
  * syscalls — shuffle I/O, not compute — with run-to-run wall times
  * swinging 4× under disk contention. Pointing `spark.local.dir` at
  * tmpfs removes the disk from the shuffle path entirely; this is the
  * local-mode analog of the reference's memory-levitated merge
  * (`src/Merger/MergeManager.cc` streams merged runs RDMA-to-memory
  * precisely to keep the reduce path off spinning media). On a real
  * cluster the same knob points at local NVMe — the decision "shuffle
  * never waits on slow storage" is the part that carries to 100 TB.
  *
  * Stale run dirs (crashed JVMs) are swept on the next session build so
  * tmpfs pages are not leaked across rounds.
  */
object LocalDirs {
  def dir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-shuffle")
      d.mkdirs()
      sweepStale(d)
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir")
  }

  /** Best-effort removal of spark-* scratch dirs older than 6 h. */
  private def sweepStale(root: java.io.File): Unit = {
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    val stale = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.lastModified() < cutoff)
    stale.foreach(deleteRec)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }
}
