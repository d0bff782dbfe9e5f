package graft.operators

import java.util.concurrent.atomic.AtomicLong

/** A crash-injecting local filesystem for convergence sweeps: behaves as
  * `RawLocalFileSystem` under the `crash://` scheme, but every MUTATING
  * operation (create, rename, delete, mkdirs — the ops whose orderings
  * the staged-write/fingerprint disciplines reason about) decrements a
  * global budget and throws once it reaches zero. A spec can therefore
  * run a multi-step writer with budget = N for EVERY prefix N, replay
  * with the budget off, and assert the final state equals a never-crashed
  * run — turning the hand-picked crash-window specs into an exhaustive
  * sweep over all interleaving points the filesystem can observe
  * (including the ones inside Spark's own committer protocol).
  *
  * Registration: `conf.set("fs.crash.impl", classOf[CrashFs].getName)`;
  * use paths of the form `crash:///abs/path`. The budget is JVM-global
  * (local-mode executors share it), -1 disables injection.
  */
class CrashFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "crash"

  // companion constant, NOT an instance val: RawLocalFileSystem's own
  // constructor calls makeQualified → getUri before subclass fields exist
  override def getUri: java.net.URI = CrashFs.SchemeUri

  private def tick(op: String, p: org.apache.hadoop.fs.Path): Unit =
    CrashFs.tick(op, p)

  override def create(f: org.apache.hadoop.fs.Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    tick("create", f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def createNonRecursive(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag], bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    tick("createNonRecursive", f)
    super.createNonRecursive(f, permission, flags, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    tick("rename", src)
    super.rename(src, dst)
  }

  override def delete(f: org.apache.hadoop.fs.Path, recursive: Boolean): Boolean = {
    tick("delete", f)
    super.delete(f, recursive)
  }

  override def mkdirs(f: org.apache.hadoop.fs.Path): Boolean = {
    tick("mkdirs", f)
    super.mkdirs(f)
  }
}

object CrashFs {
  val SchemeUri: java.net.URI = java.net.URI.create("crash:///")

  /** Remaining mutation budget; -1 = unlimited (no injection). */
  val budget = new AtomicLong(-1L)

  /** Total mutations observed since the last reset — a dry run with the
    * budget off measures how many prefixes a sweep must cover. */
  val observed = new AtomicLong(0L)

  private[operators] def tick(op: String, p: org.apache.hadoop.fs.Path): Unit = {
    observed.incrementAndGet()
    if (budget.get() >= 0L) {
      // STICKY exhaustion — kill -9 semantics, not graceful abort: the
      // first n mutations succeed, the (n+1)-th and EVERY later one fail,
      // so Spark's own abort/cleanup paths cannot tidy up what a real
      // process death would have left behind. unlimited() is the reboot.
      val pre = budget.getAndUpdate(x => if (x > 0L) x - 1L else x)
      if (pre <= 0L)
        throw new java.io.IOException(
          s"injected crash at $op(${p.toUri.getPath})")
    }
  }

  def unlimited(): Unit = budget.set(-1L)
  def armed(n: Long): Unit = { budget.set(n) }
  def resetObserved(): Unit = observed.set(0L)
}
