package graft.wikidata

import java.io.{BufferedOutputStream, FileOutputStream, IOException, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.Path

/** Resumable HTTP downloader — the reference's front door
  * (/root/reference/src/input/http.rs:15-218), as a driver-side utility that
  * fetches the dump to the landing dir the engine then reads. This is
  * deliberately OUTSIDE the query engine (SURVEY A1/A2): at cluster scale the
  * download happens once to distributed storage; the engine's source is
  * `spark.read.text` over the landed (block-splittable) bz2.
  *
  * Semantics preserved from the reference:
  *  - on a dropped connection, reopen with `Range: bytes=N-` where N is the
  *    byte count already consumed (http.rs:48-66);
  *  - the ETag of the resumed response must match the original — the file
  *    changed upstream otherwise (http.rs:82-86);
  *  - the `Content-Range` start offset may be BEFORE N (server rounds down);
  *    the overlap is skipped so the byte stream continues exactly where it
  *    left off (http.rs:95-137). An offset after N is an error;
  *  - a server that ignores Range and replays from 0 is handled by the same
  *    skip path (res_offset = 0, http.rs:117);
  *  - bounded open retries: 32 attempts, 8 s apart (http.rs:10-11,154-177) —
  *    both injectable here so tests don't sleep;
  *  - progress every 10 s: bytes, %, MB/s, ETA (main.rs:192-225, D5).
  */
object Fetch {

  final case class Config(
      maxOpenTries: Int = 32,          // http.rs:10 MAX_OPEN_TRIES
      retryIntervalMs: Long = 8000,    // http.rs:11 OPEN_RETRY_INTERVAL_SECS
      userAgent: String = "graft geo-db downloader",
      connectTimeoutMs: Int = 30000,
      readTimeoutMs: Int = 60000,
      progressEveryMs: Long = 10000,   // main.rs:193
      log: String => Unit = s => System.err.println(s))

  final class EtagMismatch extends IOException(
    "ETag changed between connections — upstream file was replaced")
  final class ContentRangeTooSmall extends IOException(
    "Content-Range start offset is after the resume point")

  /** State of one open connection. */
  private final case class Conn(in: InputStream, etag: String, len: Option[Long])

  /** Downloads `url` to `dest`, resuming across dropped connections.
    * Returns the total byte count written. Throws after `maxOpenTries`
    * consecutive failed opens, or on ETag mismatch at any reopen. */
  def download(url: String, dest: Path, cfg: Config = Config()): Long = {
    val out = new BufferedOutputStream(new FileOutputStream(dest.toFile), 1 << 16)
    try {
      var written = 0L
      var etag: Option[String] = None
      var total: Option[Long] = None
      var done = false
      var zeroProgress = 0 // consecutive connections that added no bytes
      val buf = new Array[Byte](1 << 16)
      val t0 = System.nanoTime()
      var lastReport = t0
      while (!done) {
        val conn = openWithRetry(url, written, etag, cfg)
        if (etag.isEmpty) { etag = Some(conn.etag); total = conn.len }
        val before = written
        var interrupted = false
        try {
          var eof = false
          while (!eof) {
            val n = conn.in.read(buf)
            if (n < 0) eof = true
            else {
              out.write(buf, 0, n)
              written += n
              val now = System.nanoTime()
              if ((now - lastReport) / 1000000 >= cfg.progressEveryMs) {
                lastReport = now
                cfg.log(progressLine(written, total, (now - t0) / 1e9))
              }
            }
          }
        } catch {
          case _: IOException => interrupted = true // dropped — reopen w/ Range
        } finally {
          try conn.in.close() catch { case _: IOException => () }
        }
        // A clean EOF before content-length is also an interrupted stream
        // (the reference sees it as an io error from the bz2 decoder).
        // Conversely, written >= total is DONE even if the connection
        // dropped on the very last byte: a reopen at byte `total` would
        // only draw 416 Range Not Satisfiable forever.
        done = total match {
          case Some(t) => written >= t
          case None => !interrupted
        }
        if (!done) {
          zeroProgress = if (written == before) zeroProgress + 1 else 0
          if (zeroProgress >= cfg.maxOpenTries) throw new IOException(
            s"no progress after $zeroProgress consecutive connections at byte $written")
        }
      }
      out.flush()
      cfg.log(f"[fetch] done: $written%d bytes in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      written
    } finally out.close()
  }

  private def progressLine(written: Long, total: Option[Long], secs: Double): String = {
    val mbs = written / 1e6 / math.max(secs, 1e-9)
    total match {
      case Some(t) if t > 0 =>
        val pct = 100.0 * written / t
        val eta = (t - written) / 1e6 / math.max(mbs, 1e-9)
        f"[fetch] $written%d / $t%d bytes ($pct%.1f%%), $mbs%.1f MB/s, ETA $eta%.0f s"
      case _ => f"[fetch] $written%d bytes, $mbs%.1f MB/s"
    }
  }

  /** try_open (http.rs:154-177): bounded retries, fixed interval. ETag
    * mismatch is not retried — the upstream file changed; a retry can never
    * succeed and restarting from byte 0 silently corrupts the resume. */
  private def openWithRetry(url: String, offset: Long, expectEtag: Option[String],
      cfg: Config): Conn = {
    var tryCount = 1
    while (true) {
      try return open(url, offset, expectEtag, cfg)
      catch {
        case e: EtagMismatch => throw e
        case e: IOException =>
          if (tryCount >= cfg.maxOpenTries) throw e
          tryCount += 1
          cfg.log(s"[fetch] open failed (try $tryCount/${cfg.maxOpenTries}): ${e.getMessage}")
          Thread.sleep(cfg.retryIntervalMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One open (http.rs:48-152): GET with Range when resuming, ETag + range
    * validation, overlap skip. */
  private def open(url: String, offset: Long, expectEtag: Option[String],
      cfg: Config): Conn = {
    val c = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setConnectTimeout(cfg.connectTimeoutMs)
    c.setReadTimeout(cfg.readTimeoutMs)
    c.setRequestProperty("User-Agent", cfg.userAgent)
    if (offset > 0) c.setRequestProperty("Range", s"bytes=$offset-")
    val code = c.getResponseCode
    if (code != 200 && code != 206) {
      c.disconnect()
      throw new IOException(s"HTTP $code from $url")
    }
    val etag = Option(c.getHeaderField("ETag")).getOrElse("")
    val in = c.getInputStream
    if (offset > 0) {
      if (!expectEtag.contains(etag)) { in.close(); throw new EtagMismatch }
      // Content-Range: bytes <start>-<end>/<size>; absent (code 200) = 0.
      val resOffset = Option(c.getHeaderField("Content-Range")) match {
        case Some(cr) =>
          val parts = cr.trim.split(" ", 2)
          if (parts.length != 2 || parts(0) != "bytes") {
            in.close(); throw new IOException(s"unexpected Content-Range: $cr")
          }
          parts(1).split("/")(0).split("-")(0).toLong
        case None => 0L
      }
      if (resOffset > offset) { in.close(); throw new ContentRangeTooSmall }
      // skip the overlap so the next byte read is exactly `offset`
      var toSkip = offset - resOffset
      val buf = new Array[Byte](8192)
      while (toSkip > 0) {
        val n = in.read(buf, 0, math.min(toSkip, buf.length.toLong).toInt)
        if (n < 0) { in.close(); throw new IOException("EOF while skipping overlap") }
        toSkip -= n
      }
      Conn(in, etag, None) // length already known from the first response
    } else {
      val len = c.getContentLengthLong match { case -1 => None; case l => Some(l) }
      Conn(in, etag, len)
    }
  }

  /** CLI: `graft.wikidata.Fetch <url> <destFile>`. */
  def main(args: Array[String]): Unit = args match {
    case Array(url, dest) => download(url, java.nio.file.Paths.get(dest))
    case _ =>
      System.err.println("usage: graft.wikidata.Fetch <url> <destFile>")
      sys.exit(2)
  }
}
