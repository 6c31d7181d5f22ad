package graft

import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.ObjectStore

/** S8 driven END TO END over the real S3 REST protocol against an
  * in-process object store (the HttpSourceSpec pattern — no aws-sdk or
  * MinIO binary exists in this sandbox, but the protocol itself needs
  * neither): single-part PUT under the threshold, the 3-phase
  * Initiate → UploadPart → Complete sequence above it (minio.rs:139–242
  * semantics), byte-identical assembly, the strict `size > chunk` fence,
  * ETag echo validation, and the distributed spool upload whose objects
  * read back as the same parquet rows. The server VALIDATES, not just
  * records: a part ETag mis-echoed at complete time, an out-of-order
  * part list, or a completed object diverging from the source bytes all
  * fail the spec. */
object S3Store {
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

  def reset(): Unit = { objects.clear(); uploads.clear(); ops.clear(); failParts = false }

  def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString
}

class S3ProtocolPutSpec extends SparkSpecBase {

  private var server: HttpServer = _
  private var baseUrl: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
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
            S3Store.bump("initiate")
            val id = s"up-${S3Store.nextId.incrementAndGet()}"
            S3Store.uploads.put(id, (path, new ConcurrentHashMap()))
            respond(200,
              s"<InitiateMultipartUploadResult><UploadId>$id</UploadId></InitiateMultipartUploadResult>")
          case ("PUT", p) if p.contains("partNumber") =>
            S3Store.bump("part")
            if (S3Store.failParts) respond(500, "InternalError")
            else {
              val id = p("uploadId")
              val partNo = p("partNumber").toInt
              val etag = "\"" + S3Store.md5hex(body) + "\""
              Option(S3Store.uploads.get(id)) match {
                case Some((_, parts)) =>
                  parts.put(partNo, (body, etag))
                  respond(200, headers = Map("ETag" -> etag))
                case None => respond(404, "NoSuchUpload")
              }
            }
          case ("POST", p) if p.contains("uploadId") =>
            S3Store.bump("complete")
            val id = p("uploadId")
            Option(S3Store.uploads.remove(id)) match {
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
                  S3Store.objects.put(objPath, assembled)
                  respond(200,
                    s"<CompleteMultipartUploadResult><ETag>\"${S3Store.md5hex(assembled)}-${listed.size}\"</ETag></CompleteMultipartUploadResult>")
                }
              case None => respond(404, "NoSuchUpload")
            }
          case ("PUT", _) =>
            S3Store.bump("put")
            S3Store.objects.put(path, body)
            respond(200, headers = Map("ETag" -> ("\"" + S3Store.md5hex(body) + "\"")))
          case ("DELETE", p) if p.contains("uploadId") =>
            S3Store.bump("abort")
            Option(S3Store.uploads.remove(p("uploadId"))) match {
              case Some(_) => respond(204)
              case None => respond(404, "NoSuchUpload")
            }
          case _ => respond(405, "MethodNotAllowed")
        }
      }
    })
    server.start()
    baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def scratch = spark.conf.get("spark.graft.scratchDir",
    "/root/repo/target/graft-tmp")

  private def writeBytes(name: String, n: Int): java.io.File = {
    val f = new java.io.File(s"$scratch/s3put/$name")
    f.getParentFile.mkdirs()
    val rnd = new java.util.Random(42)
    val bytes = new Array[Byte](n); rnd.nextBytes(bytes)
    java.nio.file.Files.write(f.toPath, bytes)
    f
  }

  test("single-part: a file within one chunk ships as ONE plain PUT") {
    S3Store.reset()
    val f = writeBytes("small.parquet", 10000)
    val r = ObjectStore.putFile(baseUrl, "corpus", "spool/small.parquet", f,
      chunkSize = 64 * 1024)
    assert(r.parts === 0 && r.size === 10000L)
    assert(S3Store.count("put") === 1 && S3Store.count("initiate") === 0 &&
      S3Store.count("part") === 0 && S3Store.count("complete") === 0)
    val stored = S3Store.objects.get("corpus/spool/small.parquet")
    assert(stored.toSeq === java.nio.file.Files.readAllBytes(f.toPath).toSeq,
      "single-part bytes diverged")
    assert(r.etag === "\"" + S3Store.md5hex(stored) + "\"")
  }

  test("multipart: chunked parts, ETag echo, byte-identical assembly") {
    S3Store.reset()
    val chunk = 64 * 1024
    val size = chunk * 2 + 12345 // 3 parts, ragged tail
    val f = writeBytes("big.parquet", size)
    val r = ObjectStore.putFile(baseUrl, "corpus", "spool/big.parquet", f,
      chunkSize = chunk)
    assert(r.parts === 3 && r.size === size.toLong)
    assert(S3Store.count("initiate") === 1 && S3Store.count("part") === 3 &&
      S3Store.count("complete") === 1 && S3Store.count("put") === 0)
    val stored = S3Store.objects.get("corpus/spool/big.parquet")
    assert(stored.length === size)
    assert(stored.toSeq === java.nio.file.Files.readAllBytes(f.toPath).toSeq,
      "multipart assembly diverged from the source bytes")
    // the completed-object etag carries the S3 multipart marker
    assert(r.etag.endsWith("-3\""), s"unexpected multipart etag ${r.etag}")
  }

  test("the fence is STRICTLY greater-than: an exactly-chunk-sized file is single-part") {
    // minio.rs:143 `if file_size > CHUNK_SIZE` — a file of exactly one
    // chunk must NOT pay the 3-phase protocol
    S3Store.reset()
    val chunk = 64 * 1024
    val f = writeBytes("exact.parquet", chunk)
    val r = ObjectStore.putFile(baseUrl, "corpus", "spool/exact.parquet", f,
      chunkSize = chunk)
    assert(r.parts === 0)
    assert(S3Store.count("put") === 1 && S3Store.count("initiate") === 0)
    // one byte more crosses it
    val g = writeBytes("over.parquet", chunk + 1)
    val r2 = ObjectStore.putFile(baseUrl, "corpus", "spool/over.parquet", g,
      chunkSize = chunk)
    assert(r2.parts === 2)
    assert(S3Store.count("initiate") === 1)
  }

  test("a failed part surfaces as an error, never a silently short object") {
    S3Store.reset()
    val f = writeBytes("doomed.parquet", 200 * 1024)
    S3Store.failParts = true
    val e = intercept[IllegalArgumentException] {
      ObjectStore.putFile(baseUrl, "corpus", "spool/doomed.parquet", f,
        chunkSize = 64 * 1024)
    }
    assert(e.getMessage.contains("HTTP 500"))
    assert(!S3Store.objects.containsKey("corpus/spool/doomed.parquet"),
      "a failed upload left a committed object")
    // r12-advice: the failure path must ABORT the upload — a real store
    // bills the staged parts forever otherwise (invisible to LIST, only
    // a lifecycle rule reclaims them)
    assert(S3Store.count("abort") === 1, "failed part did not abort the upload")
    assert(S3Store.uploads.isEmpty, "abort left staged parts in flight")
  }

  test("keys with spaces and reserved characters percent-encode on the wire, both paths") {
    S3Store.reset()
    val key = "spool dir/run=1/odd+name #7&q?.parquet"
    val small = writeBytes("odd_small.parquet", 10000)
    val r1 = ObjectStore.putFile(baseUrl, "corpus", key, small, chunkSize = 64 * 1024)
    assert(r1.parts === 0)
    val stored1 = S3Store.objects.get(s"corpus/$key")
    assert(stored1 != null,
      s"decoded key missing; stored keys = ${S3Store.objects.keySet()}")
    assert(stored1.toSeq === java.nio.file.Files.readAllBytes(small.toPath).toSeq)
    val big = writeBytes("odd_big.parquet", 200 * 1024)
    val r2 = ObjectStore.putFile(baseUrl, "corpus", key, big, chunkSize = 64 * 1024)
    assert(r2.parts === 4)
    assert(S3Store.objects.get(s"corpus/$key").toSeq ===
      java.nio.file.Files.readAllBytes(big.toPath).toSeq,
      "multipart assembly diverged on the encoded key")
  }

  test("s8: a written parquet spool ships distributed and reads back as the same rows") {
    import spark.implicits._
    S3Store.reset()
    val spool = s"$scratch/s3put/spool_dir"
    val slice = graft.operators.Etl.vendorFrame(spark, sfDir,
      $"o_orderdate" >= lit("2000-03-01").cast("timestamp")
        && $"o_orderdate" < lit("2000-03-05").cast("timestamp"))
    slice.repartition(4).write.mode("overwrite").parquet(spool)
    val expected = slice.count()
    // a tiny chunk forces the multipart path on real parquet part files
    val manifest = ObjectStore.s8UploadDir(spark, spool, baseUrl, "corpus",
      "export/run1", chunkSize = 16 * 1024).collect()
    val dataFiles = new java.io.File(spool).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(manifest.length === dataFiles.length)
    manifest.zip(dataFiles).foreach { case (row, f) =>
      assert(row.getAs[String]("key") === s"export/run1/${f.getName}")
      assert(row.getAs[Long]("size") === f.length())
    }
    // download every object and read the assembled parquet back
    val back = s"$scratch/s3put/downloaded"
    val backDir = new java.io.File(back)
    org.apache.commons.io.FileUtils.deleteQuietly(backDir)
    backDir.mkdirs()
    manifest.foreach { row =>
      val key = row.getAs[String]("key")
      val bytes = S3Store.objects.get(s"corpus/$key")
      assert(bytes != null, s"object $key missing from the store")
      java.nio.file.Files.write(
        new java.io.File(backDir, key.split('/').last).toPath, bytes)
    }
    assert(spark.read.parquet(back).count() === expected,
      "round-tripped spool lost rows")
  }
}
