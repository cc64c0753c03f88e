package graft.stream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** Atomic-publish protocol for a parquet snapshot that is rewritten
  * per micro-batch ([[Streaming.startUpsertSink]]). The sink's loop is
  * committer-agnostic: `recover(); read current(); write to stage();
  * commit(staged)` — the committer owns what "atomic" means on its
  * storage.
  *
  * Two implementations cover the two storage families:
  *  - [[RenameCommitter]] — HDFS/local FS, where directory rename is
  *    atomic: two checked renames swap the snapshot in place.
  *  - [[ManifestCommitter]] — object stores (S3/GCS), where rename is
  *    a non-atomic copy+delete but a single-object PUT is atomic:
  *    snapshots are immutable versioned directories and the commit is
  *    one small manifest-pointer write. (This is the kernel of what
  *    Delta/Iceberg commit protocols do; those add multi-writer
  *    coordination this single-writer streaming sink doesn't need.)
  *
  * Contract (single writer — the streaming query's foreachBatch):
  * `recover()` must be called before `current()` each batch and must
  * leave the committer in a consistent state after ANY crash point;
  * `commit(staged)` must atomically make `staged` the result of
  * `current()`; a crash anywhere must lose at most the UNcommitted
  * batch, which the checkpoint replays (at-least-once delivery +
  * idempotent merge → exactly-once state).
  */
trait SnapshotCommitter {
  /** Finish or roll back any interrupted commit; called before reads. */
  def recover(): Unit
  /** The committed snapshot directory, if one exists yet. */
  def current(): Option[Path]
  /** An empty staging location for the next snapshot write. */
  def stage(): Path
  /** Atomically publish a fully-written staging directory. */
  def commit(staged: Path): Unit
}

/** Snapshot swap via atomic directory rename — correct on HDFS and
  * local filesystems (NOT on object stores, where rename is
  * copy+delete; use [[ManifestCommitter]] there).
  *
  * Protocol: write `path.next` → rename current to `path.old` →
  * rename `.next` in → drop `.old`. Each step is a checked rename; a
  * crash between the two renames leaves `.next` complete on disk and
  * [[recover]] finishes the swap on replay — the snapshot is never
  * the only copy that gets deleted.
  */
final class RenameCommitter(path: String, conf: Configuration)
    extends SnapshotCommitter {
  private val target = new Path(path)
  private val fs = target.getFileSystem(conf)
  private val next = new Path(path + ".next")
  private val old = new Path(path + ".old")

  def recover(): Unit = {
    // committed-but-unswapped snapshot from a crash between renames
    if (!fs.exists(target) && fs.exists(next))
      require(fs.rename(next, target),
        s"recovery rename failed: $next -> $target")
    if (fs.exists(old)) fs.delete(old, true)
    ()
  }

  def current(): Option[Path] = if (fs.exists(target)) Some(target) else None

  def stage(): Path = {
    if (fs.exists(next)) fs.delete(next, true)
    next
  }

  def commit(staged: Path): Unit = {
    if (fs.exists(target))
      require(fs.rename(target, old), s"swap rename failed: $target -> $old")
    require(fs.rename(staged, target), s"swap rename failed: $staged -> $target")
    fs.delete(old, true)
    ()
  }
}

/** Object-store-safe commit: snapshots are immutable version
  * directories `base/v<N>/` and `base/MANIFEST` holds the committed
  * version number; commit = one manifest write, which an object
  * store's single-object PUT makes atomic. No data directory is ever
  * renamed or rewritten in place.
  *
  * On Hadoop filesystems (where this class is exercised) the manifest
  * write is tmp + `FileContext.rename(OVERWRITE)` — the atomic-rename
  * equivalent of the PUT; on a real S3A deployment the tmp hop
  * collapses into the single PUT of the manifest object.
  *
  * Crash matrix: before the manifest flip, `MANIFEST` still names the
  * old version, so [[recover]] deletes the orphaned tmp/staging and
  * the replayed batch re-merges onto the old snapshot; after the
  * flip, only the garbage PREVIOUS version dir remains, which
  * [[recover]] sweeps (any version dir ≠ current is garbage — the
  * manifest alone defines truth). Single-writer; a multi-reader
  * production deployment would keep a retention window of old
  * versions instead of the immediate sweep.
  */
final class ManifestCommitter(base: String, conf: Configuration,
                              retain: Int = 1)
    extends SnapshotCommitter {
  require(retain >= 1, s"retain must be >= 1, got $retain")
  private val baseDir = new Path(base)
  private val fs = baseDir.getFileSystem(conf)
  private val manifest = new Path(baseDir, "MANIFEST")
  private val manifestTmp = new Path(baseDir, "MANIFEST.tmp")
  private val VersionDir = "v(\\d+)".r

  private def versionDir(n: Long) = new Path(baseDir, s"v$n")

  private def committedVersion(): Option[Long] =
    if (!fs.exists(manifest)) None
    else {
      val in = fs.open(manifest)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }

  /** Versions inside the retention window (committed first). Versions
    * are immutable once committed, so any listed dir is readable —
    * the time-travel surface a lakehouse table exposes.
    */
  def versions(): Seq[Long] = committedVersion() match {
    case None => Seq.empty
    case Some(cur) =>
      (cur to math.max(cur - retain + 1, 1L) by -1L)
        .filter(n => fs.exists(versionDir(n)))
  }

  /** The immutable snapshot directory of a retained version, if it is
    * still inside the retention window (`retain` newest).
    */
  def snapshotAt(n: Long): Option[Path] =
    if (versions().contains(n)) Some(versionDir(n)) else None

  def recover(): Unit = {
    if (fs.exists(manifestTmp)) fs.delete(manifestTmp, false)
    if (fs.exists(baseDir)) {
      val cur = committedVersion()
      val floor = cur.map(_ - retain + 1).getOrElse(Long.MaxValue)
      fs.listStatus(baseDir).foreach { st =>
        st.getPath.getName match {
          // above current = orphaned staging; below the retention
          // floor = swept old version — both safe to drop
          case VersionDir(n)
              if cur.forall(c => n.toLong > c) || n.toLong < floor =>
            fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    }
  }

  def current(): Option[Path] = committedVersion().map(versionDir)

  def stage(): Path = {
    val d = versionDir(committedVersion().getOrElse(0L) + 1)
    if (fs.exists(d)) fs.delete(d, true)
    d
  }

  def commit(staged: Path): Unit = {
    val VersionDir(n) = staged.getName: @unchecked
    val out = fs.create(manifestTmp, true)
    try out.write(n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // FileContext (not FileSystem.rename): supports atomic OVERWRITE
    FileContext.getFileContext(baseDir.toUri, conf)
      .rename(manifestTmp, manifest, Options.Rename.OVERWRITE)
    // sweep versions that just left the retention window
    val floor = n.toLong - retain + 1
    if (fs.exists(baseDir)) fs.listStatus(baseDir).foreach { st =>
      st.getPath.getName match {
        case VersionDir(o) if o.toLong < floor => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
  }
}
