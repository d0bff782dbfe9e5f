package graft.wikidata

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the resume semantics of [[Fetch]] against a real local HTTP
  * server (reference /root/reference/src/input/http.rs behavior):
  * dropped connection mid-stream → Range reopen, ETag validation,
  * Content-Range overlap skip, bounded open retries. */
class FetchSpec extends AnyFunSuite {

  // deterministic 256 KiB pattern
  private val body: Array[Byte] =
    Array.tabulate(256 * 1024)(i => ((i * 31 + (i >> 8)) & 0xff).toByte)

  private def cfg(log: String => Unit = _ => ()) =
    Fetch.Config(maxOpenTries = 5, retryIntervalMs = 1, progressEveryMs = 1,
      log = log)

  /** Runs `handler`-served downloads against an ephemeral-port server. */
  private def withServer(handler: (HttpExchange, Int) => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new AtomicInteger(0)
    server.createContext("/dump", (ex: HttpExchange) => {
      val n = hits.incrementAndGet()
      try handler(ex, n) finally ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/dump")
    finally server.stop(0)
  }

  private def rangeStart(ex: HttpExchange): Option[Long] =
    Option(ex.getRequestHeaders.getFirst("Range"))
      .map(_.stripPrefix("bytes=").takeWhile(_ != '-').toLong)

  test("resumes byte-exactly across a dropped connection, skipping overlap") {
    withServer { (ex, hit) =>
      ex.getResponseHeaders.set("ETag", "\"v1\"")
      ex.getResponseHeaders.set("Connection", "close")
      if (hit == 1) {
        assert(rangeStart(ex).isEmpty)
        // declare the full length but send only ~100 KB, then drop
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body, 0, 100000)
        // close() in the context wrapper truncates the stream
      } else {
        // resume: serve from BEFORE the requested offset (server rounds
        // down) — Fetch must skip the overlap, not duplicate it
        val req = rangeStart(ex).get
        val start = req - 1337
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $start-${body.length - 1}/${body.length}")
        ex.sendResponseHeaders(206, (body.length - start))
        ex.getResponseBody.write(body, start.toInt, (body.length - start).toInt)
      }
    } { url =>
      val dest = Files.createTempFile("fetch", ".bin")
      val n = Fetch.download(url, dest, cfg())
      assert(n === body.length.toLong)
      assert(Files.readAllBytes(dest).sameElements(body),
        "resumed file must be byte-identical to the source")
      Files.delete(dest)
    }
  }

  test("ETag change on resume fails instead of mixing two files") {
    withServer { (ex, hit) =>
      ex.getResponseHeaders.set("ETag", if (hit == 1) "\"v1\"" else "\"v2\"")
      ex.getResponseHeaders.set("Connection", "close")
      if (hit == 1) {
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body, 0, 50000)
      } else {
        val start = rangeStart(ex).get
        ex.getResponseHeaders.set("Content-Range",
          s"bytes $start-${body.length - 1}/${body.length}")
        ex.sendResponseHeaders(206, body.length - start)
        ex.getResponseBody.write(body, start.toInt, (body.length - start).toInt)
      }
    } { url =>
      val dest = Files.createTempFile("fetch", ".bin")
      assertThrows[Fetch.EtagMismatch](Fetch.download(url, dest, cfg()))
      Files.delete(dest)
    }
  }

  test("bounded open retries: errors until maxOpenTries then succeed") {
    withServer { (ex, hit) =>
      if (hit <= 3) ex.sendResponseHeaders(503, -1)
      else {
        ex.getResponseHeaders.set("ETag", "\"v1\"")
        ex.sendResponseHeaders(200, body.length.toLong)
        ex.getResponseBody.write(body)
      }
    } { url =>
      val dest = Files.createTempFile("fetch", ".bin")
      val n = Fetch.download(url, dest, cfg())
      assert(n === body.length.toLong)
      assert(Files.readAllBytes(dest).sameElements(body))
      Files.delete(dest)
    }
  }

  test("gives up after maxOpenTries consecutive failures") {
    withServer { (ex, _) => ex.sendResponseHeaders(503, -1) } { url =>
      val dest = Files.createTempFile("fetch", ".bin")
      assertThrows[java.io.IOException](
        Fetch.download(url, dest, cfg()))
      Files.delete(dest)
    }
  }
}
