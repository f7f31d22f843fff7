package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Local conditional-PUT object store speaking the S3-style wire
  * surface [[graft.sources.HttpObjectStoreClaimStore]] targets: PUT
  * with `If-None-Match: *` (412 when the key exists — the atomic CAS
  * is a ConcurrentHashMap putIfAbsent), GET/HEAD/DELETE by key, and
  * `?list-type=2&prefix=` returning ListObjectsV2-shaped `<Key>` XML.
  * Runs on a loopback ephemeral port; one instance per test. */
object TestObjectStore {

  /** Deliberately tiny list page so every multi-commit scenario drives
    * the client's continuation loop (real stores page at ~1000). */
  val PageSize = 3

  final class Server {
    private val objects = new ConcurrentHashMap[String, Array[Byte]]()
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()

    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def size: Int = objects.size()
    def keys: Seq[String] = {
      val it = objects.keySet().iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }

    private def xmlEscape(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    private def respond(ex: HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      if (body.isEmpty) ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, body.length.toLong)
        ex.getResponseBody.write(body)
      }
      ex.close()
    }

    private def handle(ex: HttpExchange): Unit = try {
      // path: /<bucket>/<key...> — bucket ignored (single-tenant test
      // store); getPath arrives percent-decoded
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val key = path.split("/", 2) match {
        case Array(_, k) => k
        case _ => ""
      }
      val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      ex.getRequestMethod match {
        case "PUT" =>
          val body = ex.getRequestBody.readAllBytes()
          val conditional = Option(
            ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
          if (conditional) {
            if (objects.putIfAbsent(key, body) != null)
              respond(ex, 412, Array.empty)
            else respond(ex, 200, Array.empty)
          } else { objects.put(key, body); respond(ex, 200, Array.empty) }
        case "GET" if query.contains("list-type=") =>
          def param(name: String): Option[String] =
            query.split('&').collectFirst {
              case q if q.startsWith(name + "=") => java.net.URLDecoder
                .decode(q.stripPrefix(name + "="), "UTF-8")
            }
          val prefix = param("prefix").getOrElse("")
          // PAGINATE like a real store (tiny page size so every suite
          // listing exercises the continuation loop): the token is the
          // last key of the previous page, keys strictly after it come
          // next — S3's lexicographic-continuation semantics
          val all = keys.filter(_.startsWith(prefix)).sorted
          val after = param("continuation-token")
          val remaining = after.fold(all)(t => all.dropWhile(_ <= t))
          val page = remaining.take(PageSize)
          val truncated = remaining.size > PageSize
          val xml = "<ListBucketResult>" +
            page.map(k =>
              s"<Contents><Key>${xmlEscape(k)}</Key></Contents>")
              .mkString +
            s"<IsTruncated>$truncated</IsTruncated>" +
            (if (truncated)
              s"<NextContinuationToken>${xmlEscape(page.last)}" +
                "</NextContinuationToken>"
             else "") +
            "</ListBucketResult>"
          respond(ex, 200, xml.getBytes("UTF-8"))
        case "GET" =>
          Option(objects.get(key)) match {
            case Some(b) => respond(ex, 200, b)
            case None => respond(ex, 404, Array.empty)
          }
        case "HEAD" =>
          respond(ex, if (objects.containsKey(key)) 200 else 404,
            Array.empty)
        case "DELETE" =>
          respond(ex,
            if (objects.remove(key) != null) 204 else 404, Array.empty)
        case _ => respond(ex, 405, Array.empty)
      }
    } catch { case _: Throwable => try respond(ex, 500, Array.empty)
      catch { case _: Throwable => () } }
  }
}
