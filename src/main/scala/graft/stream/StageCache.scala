package graft.stream

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-(query, fixture) cache for the streaming queries' staged INPUT
  * files (round-15 verdict #6).
  *
  * Every `q_stream_*` execution used to re-stage its micro-batch
  * input fixture — id-sliced copies of the events table, watermark
  * sentinels, replay files, each a `coalesce(1)` parquet write — into
  * a fresh temp dir: ~52 s of the 282 s bench suite, repeated for the
  * warm run, the measured run, and again at every scale pass (where
  * the slices are 10×/30× bigger). The staged files are a PURE
  * function of (query, source fixture): same slices, same sentinel
  * rows, same hard-coded modification times (the file source orders
  * pending files by mtime — the cache preserves them because a
  * directory rename never touches child attributes). So stage once,
  * key on the fixture's identity, and let every later run read the
  * cached input directory. Checkpoint and output dirs are NOT cached
  * — they stay per-run temp dirs (a reused checkpoint would make the
  * second run a no-data replay).
  *
  * Staleness: the stamp pins the source directory's real path plus
  * size+mtime of the two tables streaming queries stage from
  * (events, documents) — the upscale fixtures regenerate IN PLACE at
  * the same path, which path-only keying would silently miss.
  *
  * Concurrency (parallel test suites): builds happen in a private
  * temp dir and publish via atomic rename; losing a race discards
  * the duplicate build and serves the winner's cache.
  */
private[stream] object StageCache {
  private def stamp(tag: String, sfDir: String): String = {
    val ids = Seq("events.parquet", "documents.parquet").map { t =>
      val p = Paths.get(sfDir, t)
      if (Files.exists(p))
        s"$t=${Files.size(p)}@${Files.getLastModifiedTime(p).toMillis}"
      else s"$t=absent"
    }
    s"v1 tag=$tag src=${Paths.get(sfDir).toRealPath()} ${ids.mkString(" ")}"
  }

  /** Returns the cached input directory for (tag, sfDir), running
    * `build(workDir, inDir)` only on a cache miss: the block stages
    * its input files into `inDir` and may scribble Spark write
    * scaffolding anywhere under `workDir` (everything except `inDir`
    * is discarded before publication).
    */
  def cachedIn(tag: String, sfDir: String)(build: (Path, Path) => Unit): Path = {
    val want = stamp(tag, sfDir)
    val root = Paths.get(System.getProperty("java.io.tmpdir"), "graft_stage_cache")
    Files.createDirectories(root)
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(want))
    val dest = root.resolve(s"${tag}_$key")
    val marker = dest.resolve("_STAGED_OK")
    def valid: Boolean =
      Files.exists(marker) && new String(Files.readAllBytes(marker), "UTF-8") == want
    if (valid) return dest.resolve("in")
    val work = Files.createTempDirectory(root, s".build_${tag}_")
    val in = work.resolve("in"); Files.createDirectories(in)
    build(work, in)
    val leftovers = Files.list(work)
    try leftovers.filter(p => p.getFileName.toString != "in")
      .forEach(p => deleteRec(p))
    finally leftovers.close()
    // marker LAST: a crash mid-build leaves no marker, never a
    // half-staged cache that validates
    Files.write(work.resolve("_STAGED_OK"), want.getBytes("UTF-8"))
    if (Files.exists(dest)) deleteRec(dest) // stale fixture generation
    try Files.move(work, dest, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: Throwable =>
        // lost a concurrent build race — discard ours, serve the winner
        deleteRec(work)
        if (!valid) throw new IllegalStateException(
          s"StageCache: lost the build race for $dest but no valid cache is present")
    }
    dest.resolve("in")
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(q => Files.deleteIfExists(q))
}
