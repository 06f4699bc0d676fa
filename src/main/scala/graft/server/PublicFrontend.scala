package graft.server

import java.io.{InputStream, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import scala.collection.mutable

/** The server's public TCP listener. `com.sun.net.httpserver` cannot hand
  * over a connection after a 101 response, so the public port is a plain
  * JDK ServerSocket: a websocket upgrade for `/socket.io` is handled
  * in-process (RFC 6455 + Engine.IO), and every other connection is
  * byte-relayed to the internal HttpServer bound on a loopback port — HTTP
  * semantics (keep-alive, chunking, bodies) pass through untouched because
  * the relay never interprets them.
  */
class PublicFrontend(port: Int,
    internalPort: Int,
    wsHandler: (Socket, PublicFrontend.RequestHead) => Unit) {

  import PublicFrontend._

  private val listener =
    new ServerSocket(port, 128, InetAddress.getLoopbackAddress)
  private val pool = Executors.newCachedThreadPool { r =>
    val t = new Thread(r, "graft-frontend"); t.setDaemon(true); t
  }
  private val live = mutable.Set.empty[Socket]
  @volatile private var closed = false

  def boundPort: Int = listener.getLocalPort

  def start(): Unit = pool.execute(() => acceptLoop())

  def stop(): Unit = {
    closed = true
    try listener.close() catch { case _: Exception => }
    live.synchronized { live.foreach(s =>
      try s.close() catch { case _: Exception => }); live.clear() }
    pool.shutdownNow()
  }

  private def acceptLoop(): Unit =
    while (!closed) {
      val sock =
        try listener.accept()
        catch { case _: Exception => return } // listener closed
      live.synchronized { live += sock }
      pool.execute(() =>
        try dispatch(sock)
        catch { case _: Exception => try sock.close() catch { case _: Exception => } }
        finally live.synchronized { live -= sock })
    }

  private def dispatch(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = sock.getInputStream
    val headBytes = readHead(in)
    if (headBytes.isEmpty) { sock.close(); return }
    val head = parseHead(headBytes)
    val isWsUpgrade = head.method == "GET" &&
      head.header("upgrade").exists(_.equalsIgnoreCase("websocket")) &&
      head.path.startsWith("/socket.io")
    if (isWsUpgrade) wsHandler(sock, head)
    else relay(sock, headBytes)
  }

  /** Read exactly through the first CRLFCRLF — one unbuffered byte at a
    * time so not a single body/pipeline byte is consumed past the head
    * (the relay forwards the head verbatim and pumps the rest raw). */
  private def readHead(in: InputStream): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(512)
    var state = 0 // consecutive bytes of \r\n\r\n matched
    while (state != 4) {
      val b = in.read()
      if (b < 0) return Array.emptyByteArray
      bos.write(b)
      state = (state, b) match {
        case (0, '\r') => 1
        case (1, '\n') => 2
        case (2, '\r') => 3
        case (3, '\n') => 4
        case (_, '\r') => 1
        case _ => 0
      }
      if (bos.size > 64 * 1024)
        throw new java.io.IOException("request head too large")
    }
    bos.toByteArray
  }

  private def parseHead(head: Array[Byte]): RequestHead = {
    val lines = new String(head, UTF_8).split("\r\n")
    val req = lines.headOption.getOrElse("").split(" ")
    val headers = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
    }.toMap
    val target = if (req.length > 1) req(1) else "/"
    val qIdx = target.indexOf('?')
    RequestHead(
      method = req.headOption.getOrElse(""),
      path = if (qIdx < 0) target else target.take(qIdx),
      rawQuery = if (qIdx < 0) "" else target.drop(qIdx + 1),
      headers = headers)
  }

  /** Dumb bidirectional byte pump to the internal HttpServer. */
  private def relay(client: Socket, headBytes: Array[Byte]): Unit = {
    val upstream = new Socket(InetAddress.getLoopbackAddress, internalPort)
    upstream.setTcpNoDelay(true)
    live.synchronized { live += upstream }
    def pump(src: InputStream, dst: OutputStream, other: Socket): Unit = {
      val buf = new Array[Byte](8192)
      try {
        var n = src.read(buf)
        while (n >= 0) {
          dst.write(buf, 0, n); dst.flush()
          n = src.read(buf)
        }
      } catch { case _: Exception => }
      finally {
        try other.shutdownOutput() catch { case _: Exception =>
          try other.close() catch { case _: Exception => } }
      }
    }
    upstream.getOutputStream.write(headBytes)
    upstream.getOutputStream.flush()
    pool.execute(() =>
      try pump(upstream.getInputStream, client.getOutputStream, client)
      finally live.synchronized { live -= upstream })
    pump(client.getInputStream, upstream.getOutputStream, upstream)
  }
}

object PublicFrontend {
  case class RequestHead(method: String, path: String, rawQuery: String,
      headers: Map[String, String]) {
    def header(name: String): Option[String] = headers.get(name.toLowerCase)
    def query: Map[String, String] =
      rawQuery.split('&').iterator.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }.toMap
  }
}
