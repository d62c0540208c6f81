package graft.streaming

/** Scratch-dir allocator for the driver-gated streaming REPLAY queries
  * (streaming_neardup_replay, streaming_hybrid_index_replay). Those queries
  * return lazy frames that read parquet back from the scratch dirs, so the
  * dirs can't be deleted before the caller materializes the result — the
  * r13 version simply never deleted them, and repeated gate runs
  * accumulated tmpdir parquet. Every dir allocated here is removed by one
  * JVM shutdown hook instead: alive exactly as long as any frame that
  * could still read it, gone when the run ends.
  *
  * Root: `SPARK_GRAFT_SCRATCH` if set, else java.io.tmpdir. The env knob is
  * the multi-node story — a driver-local tmpdir is only readable by a
  * single-JVM cluster (local mode, where the gates run); on a real cluster
  * point it at shared storage the executors can reach. Verification
  * surface, not a production sink.
  */
private[graft] object ReplayScratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { root =>
        try deleteRecursively(root.toFile)
        catch { case _: Throwable => () } // best effort at exit
      }
    }, "graft-replay-scratch-cleanup"))

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** A fresh scratch dir under the configured root, registered for
    * recursive deletion at JVM exit. */
  def dir(prefix: String): String = {
    val root = sys.env.get("SPARK_GRAFT_SCRATCH")
      .map(java.nio.file.Paths.get(_))
      .getOrElse(java.nio.file.Paths.get(sys.props("java.io.tmpdir")))
    java.nio.file.Files.createDirectories(root)
    val d = java.nio.file.Files.createTempDirectory(root, prefix)
    hookInstalled
    created.add(d)
    d.toString
  }
}
