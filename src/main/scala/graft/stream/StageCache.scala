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
  * the duplicate build and serves the winner's cache. The published
  * path is stamp-versioned (the dir name embeds the stamp hash), so a
  * regenerated fixture publishes to a NEW name and old readers keep
  * their files; an invalid directory squatting on the key (truncated
  * marker, hash collision) is moved ASIDE atomically — never deleted
  * in place — so a reader mid-stream never watches files vanish from
  * a path it resolved (round-17 advice). The marker also carries a
  * name:size manifest of the staged files, so an externally truncated
  * `in/` dir re-stages instead of validating on the marker alone.
  */
private[graft] object StageCache {
  /** Monotone count of cache-miss fixture builds this JVM. The bench
    * harness snapshots it around a streaming query's warm run: a warm
    * run that paid a one-time fixture build must not feed the
    * |measured − warm| contention signal (the build is staging cost,
    * not contention — round-17 advice).
    */
  private val buildsDone = new java.util.concurrent.atomic.AtomicLong(0)
  def builds: Long = buildsDone.get

  /** Sorted `relpath:size` lines for every regular file under `in` —
    * the marker's truncation-detection payload. Cheap: streaming
    * fixtures stage a handful of single-file parquet writes.
    */
  private def manifest(in: Path): String =
    if (!Files.exists(in)) "" else {
      val s = Files.walk(in)
      try s.filter(p => Files.isRegularFile(p))
        .map[String](p => s"${in.relativize(p)}:${Files.size(p)}")
        .sorted().toArray.mkString("\n")
      finally s.close()
    }

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
    // same RAM-backed base as the per-run scratch dirs (Scratch):
    // the staged fixtures are re-read by every streaming run, and on
    // the sandbox's ext4 /tmp those reads are disk ops for no reason.
    // Builds stay under the SAME root so the atomic publish rename
    // never crosses filesystems.
    val root = graft.util.Scratch.base.resolve("graft_stage_cache")
    Files.createDirectories(root)
    val key = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(want))
    val dest = root.resolve(s"${tag}_$key")
    val marker = dest.resolve("_STAGED_OK")
    def valid: Boolean =
      Files.exists(marker) &&
        new String(Files.readAllBytes(marker), "UTF-8") ==
          want + "\n" + manifest(dest.resolve("in"))
    if (valid) return dest.resolve("in")
    val work = Files.createTempDirectory(root, s".build_${tag}_")
    val in = work.resolve("in"); Files.createDirectories(in)
    build(work, in)
    buildsDone.incrementAndGet()
    val leftovers = Files.list(work)
    try leftovers.filter(p => p.getFileName.toString != "in")
      .forEach(p => deleteRec(p))
    finally leftovers.close()
    // marker LAST: a crash mid-build leaves no marker, never a
    // half-staged cache that validates
    Files.write(work.resolve("_STAGED_OK"),
      (want + "\n" + manifest(in)).getBytes("UTF-8"))
    if (Files.exists(dest)) {
      // an INVALID dir is squatting on the key (truncated marker /
      // external damage — a stale stamp lands on a different key).
      // Move it aside atomically and GC the moved-aside copy: a
      // concurrent reader that already resolved `dest` keeps its open
      // handles; one that re-opens sees either the old tree or (after
      // the move below) the fresh one, never a half-deleted dir.
      val trash = root.resolve(s".trash_${tag}_${System.nanoTime()}")
      try { Files.move(dest, trash, StandardCopyOption.ATOMIC_MOVE); deleteRec(trash) }
      catch { case _: Throwable => () } // raced another rebuilder — fall through
    }
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
