package graft

import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process S3-REST-protocol store shared by the object-store specs
  * (extracted from S3ProtocolPutSpec in r15 so ObjectStoreLogRaceSpec can
  * run its own isolated instance). The server VALIDATES rather than just
  * records — mis-echoed part ETags, out-of-order part lists and byte
  * divergence all fail — and since r15 it enforces `If-None-Match: *` on
  * PUT the way real S3 has since Nov 2024: the name claim is decided by
  * ONE atomic `putIfAbsent` on the object map, losers get 412. That
  * atomicity is the property ObjectStoreLogStore's one-winner contract
  * rides, so the race spec exercises the real decision point, not a mock
  * that cannot lose.
  */
class S3StoreState {
  // buckets HeadBucket acknowledges (real S3: buckets exist explicitly;
  // the preflight spec needs a miss to be distinguishable from a hit)
  val buckets: java.util.Set[String] = ConcurrentHashMap.newKeySet[String]()
  // completed objects: "bucket/key" -> bytes
  val objects = new ConcurrentHashMap[String, Array[Byte]]()
  // in-flight multiparts: uploadId -> (objectPath, partNo -> (bytes, etag))
  val uploads =
    new ConcurrentHashMap[String, (String, ConcurrentHashMap[Int, (Array[Byte], String)])]()
  // op counters per kind, for call-shape assertions
  val ops = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  @volatile var failParts = false
  val nextId = new java.util.concurrent.atomic.AtomicLong(0)

  def count(kind: String): Long =
    Option(ops.get(kind)).map(_.get()).getOrElse(0L)

  def bump(kind: String): Unit =
    ops.computeIfAbsent(kind, _ => new java.util.concurrent.atomic.AtomicLong(0))
      .incrementAndGet()

  def reset(): Unit = {
    buckets.clear(); objects.clear(); uploads.clear(); ops.clear(); failParts = false
  }

  def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString
}

object S3TestServer {

  /** Start a server over `store` on an ephemeral port; returns
    * (server, baseUrl). Caller stops the server. */
  def start(store: S3StoreState): (HttpServer, String) = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // a single-threaded server would SERIALIZE concurrent conditional
    // PUTs at the socket, hiding the race the log-store spec stages;
    // a thread pool keeps the contention real up to the atomic map op
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.createContext("/", handler(store))
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }

  def handler(store: S3StoreState): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val path = ex.getRequestURI.getPath.stripPrefix("/") // bucket/key...
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = query.split("&").filter(_.nonEmpty)
        .map(p => p.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k) => k -> ""
        }).toMap
      val body = ex.getRequestBody.readAllBytes()
      def respond(code: Int, payload: String = "",
          headers: Map[String, String] = Map.empty): Unit = {
        headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
        val bytes = payload.getBytes("UTF-8")
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
      (ex.getRequestMethod, params) match {
        case ("POST", p) if p.contains("uploads") =>
          store.bump("initiate")
          val id = s"up-${store.nextId.incrementAndGet()}"
          store.uploads.put(id, (path, new ConcurrentHashMap()))
          respond(200,
            s"<InitiateMultipartUploadResult><UploadId>$id</UploadId></InitiateMultipartUploadResult>")
        case ("PUT", p) if p.contains("partNumber") =>
          store.bump("part")
          if (store.failParts) respond(500, "InternalError")
          else {
            val id = p("uploadId")
            val partNo = p("partNumber").toInt
            val etag = "\"" + store.md5hex(body) + "\""
            Option(store.uploads.get(id)) match {
              case Some((_, parts)) =>
                parts.put(partNo, (body, etag))
                respond(200, headers = Map("ETag" -> etag))
              case None => respond(404, "NoSuchUpload")
            }
          }
        case ("POST", p) if p.contains("uploadId") =>
          store.bump("complete")
          val id = p("uploadId")
          Option(store.uploads.remove(id)) match {
            case Some((objPath, parts)) =>
              val listed = "<Part><PartNumber>(\\d+)</PartNumber><ETag>(.*?)</ETag></Part>".r
                .findAllMatchIn(new String(body, "UTF-8"))
                .map(m => m.group(1).toInt -> m.group(2)).toSeq
              val ascending = listed.map(_._1) == listed.map(_._1).sorted
              val allMatch = listed.forall { case (n, e) =>
                Option(parts.get(n)).exists(_._2 == e)
              }
              if (!ascending || !allMatch || listed.size != parts.size())
                respond(400, "InvalidPartOrder")
              else {
                val assembled = listed.flatMap { case (n, _) => parts.get(n)._1 }.toArray
                store.objects.put(objPath, assembled)
                respond(200,
                  s"<CompleteMultipartUploadResult><ETag>\"${store.md5hex(assembled)}-${listed.size}\"</ETag></CompleteMultipartUploadResult>")
              }
            case None => respond(404, "NoSuchUpload")
          }
        case ("PUT", _) =>
          store.bump("put")
          val etagHeaders = Map("ETag" -> ("\"" + store.md5hex(body) + "\""))
          if (Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")) {
            // real-S3 conditional create: the winner is decided by one
            // atomic putIfAbsent — the serialization point the LogStore
            // one-winner contract rides
            store.bump("condput")
            if (store.objects.putIfAbsent(path, body) != null)
              respond(412, "PreconditionFailed")
            else respond(200, headers = etagHeaders)
          } else {
            store.objects.put(path, body)
            respond(200, headers = etagHeaders)
          }
        case ("HEAD", _) =>
          // HeadBucket: the reachability preflight's decision point —
          // path is the bare bucket name (no key). No body either way,
          // exactly the real-S3 wire shape.
          store.bump("head")
          respond(if (store.buckets.contains(path)) 200 else 404)
        case ("DELETE", p) if p.contains("uploadId") =>
          store.bump("abort")
          Option(store.uploads.remove(p("uploadId"))) match {
            case Some(_) => respond(204)
            case None => respond(404, "NoSuchUpload")
          }
        case _ => respond(405, "MethodNotAllowed")
      }
    }
  }
}
