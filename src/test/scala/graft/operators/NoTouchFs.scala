package graft.operators

/** A local filesystem whose `setTimes` is a silent NO-OP — the object-store
  * (S3A) shape the lease renewer must detect (round-13 verdict #5): on such
  * a store an mtime-touch renewal never advances the lease's age, so a live
  * holder would be TTL-broken by a contender mid-run — silently reopening
  * the lost-append race the lease exists to close — unless the renewer
  * notices the non-advancing mtime and falls back to content-rewrite
  * renewal.
  *
  * Registration: `conf.set("fs.notouch.impl", classOf[NoTouchFs].getName)`;
  * paths of the form `notouch:///abs/path`.
  */
class NoTouchFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "notouch"

  // companion constant, NOT an instance val: RawLocalFileSystem's own
  // constructor calls makeQualified → getUri before subclass fields exist
  override def getUri: java.net.URI = NoTouchFs.SchemeUri

  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long,
      atime: Long): Unit = () // the S3A no-op
}

object NoTouchFs {
  val SchemeUri: java.net.URI = java.net.URI.create("notouch:///")
}
