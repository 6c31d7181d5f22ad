package graft.sources

import java.io.{File, FileInputStream}
import java.net.{HttpURLConnection, URL}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8: object-store PUT over the S3 REST protocol — the reference's
  * storage/minio.rs:139–242 semantics re-expressed without an SDK: a
  * parquet spool file ships as ONE single-part PUT when it fits in a
  * chunk, and as an InitiateMultipartUpload → UploadPart(partNumber,
  * ETag)* → CompleteMultipartUpload sequence of [[CHUNK_SIZE]] chunks
  * when it does not (minio.rs:143 `file_size > CHUNK_SIZE`). Built on
  * `java.net.HttpURLConnection` only (the Http.scala zero-dependency
  * discipline: this sandbox ships no aws-sdk/hadoop-aws, and the protocol
  * subset here is ~an afternoon of XML).
  *
  * Scale posture: the UPLOAD is distributed — [[s8UploadDir]] ships the
  * spool's file list through `mapPartitions`, so each executor uploads
  * the files it can reach and the driver only assembles the manifest
  * (file-count rows, metadata scale). That is the 1000-executor shape: no
  * byte ever routes through the driver, concurrency = task slots (the
  * reference uploads 2 files concurrently via tokio::join!, main.rs:256).
  * On a production cluster the same role is usually played by the s3a
  * committer underneath `df.write` (GraftSession.objectStoreConf's magic
  * committer + 64M multipart.size — S8SinkSpec pins those confs); this
  * operator is the explicit-protocol form for spool-then-ship pipelines
  * (the reference's own shape) and for stores where only the REST surface
  * exists. S3ProtocolPutSpec drives both paths byte-for-byte against an
  * in-process S3-protocol server, including the part-boundary fence.
  */
object ObjectStore {

  /** minio.rs:140 — 8 MB chunks; files <= this go single-part. */
  val CHUNK_SIZE: Int = 8 * 1024 * 1024

  val CONTENT_TYPE = "application/x-parquet"

  /** One uploaded object: how it shipped and what the store acknowledged
    * (parts = 0 marks the single-part path). */
  final case class PutResult(key: String, size: Long, parts: Int, etag: String)

  /** Thrown by [[putIfAbsent]] when the store refuses the conditional
    * create: 412 PreconditionFailed (the name exists) or 409 Conflict
    * (a concurrent conditional write raced this one mid-flight — real
    * S3 emits it; either way the caller did NOT win the name). */
  final class ObjectAlreadyExists(msg: String) extends java.io.IOException(msg)

  private def request(method: String, url: String,
      body: Array[Byte] = Array.emptyByteArray,
      contentType: Option[String] = None,
      reqHeaders: Map[String, String] = Map.empty): (Int, String, Map[String, String]) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    contentType.foreach(conn.setRequestProperty("Content-Type", _))
    reqHeaders.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    if (method == "PUT" || method == "POST") {
      conn.setDoOutput(true)
      conn.setFixedLengthStreamingMode(body.length)
      val out = conn.getOutputStream
      try out.write(body) finally out.close()
    }
    val code = conn.getResponseCode
    val stream = if (code < 400) conn.getInputStream else conn.getErrorStream
    val respBody =
      if (stream == null) ""
      else try new String(stream.readAllBytes(), "UTF-8") finally stream.close()
    import scala.jdk.CollectionConverters._
    // lower-cased keys: header names are case-insensitive on the wire and
    // the JDK server normalizes ETag to Etag
    val headers = conn.getHeaderFields.asScala
      .collect { case (k, vs) if k != null =>
        k.toLowerCase -> vs.asScala.headOption.getOrElse("") }
      .toMap
    conn.disconnect()
    (code, respBody, headers)
  }

  private def expectOk(what: String)(r: (Int, String, Map[String, String])):
      (String, Map[String, String]) = {
    val (code, body, headers) = r
    require(code >= 200 && code < 300, s"$what failed: HTTP $code $body")
    (body, headers)
  }

  /** RFC 3986 path-segment percent-encoding: keys with spaces or
    * reserved characters must not be spliced raw into the request line
    * (URLEncoder's form encoding alone would also be wrong — '+' means
    * space only in query strings, not paths). '/' separators are the
    * caller's structure and stay outside. */
  private[sources] def encodeSegment(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace("+", "%20")
      .replace("*", "%2A")
      .replace("%7E", "~")

  private def objectUrl(baseUrl: String, bucket: String, key: String): String =
    s"${baseUrl.stripSuffix("/")}/${encodeSegment(bucket)}/" +
      key.split("/", -1).map(encodeSegment).mkString("/")

  /** Bucket-reachability preflight — the reference's startup HeadBucket
    * (minio.rs:52–69: `head_bucket` with a contextual error before any
    * upload), the last reference behavior without an engine-side seam
    * (r16 review). One HEAD RTT, no body either way; called once on the
    * DRIVER before a fan-out, so a bad bucket or endpoint surfaces as ONE
    * loud startup error naming both, instead of N executors each failing
    * their first PUT mid-job with a bare HTTP code. */
  def headBucket(baseUrl: String, bucket: String): Unit = {
    val url = s"${baseUrl.stripSuffix("/")}/${encodeSegment(bucket)}"
    val code =
      try request("HEAD", url)._1
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"object store unreachable at $baseUrl (preflight for bucket '$bucket')", e)
      }
    if (code < 200 || code >= 300)
      throw new IllegalStateException(
        s"bucket '$bucket' not reachable at $baseUrl: HTTP $code — " +
          "create the bucket or fix the endpoint before uploading")
  }

  /** Conditional CREATE: a single-part PUT carrying `If-None-Match: *`,
    * the object store's one-winner name-claim primitive (real S3 honors
    * the precondition on PUT since Nov 2024; MinIO-class stores —
    * the reference's storage, minio.rs:139–242 — do too). Of N
    * concurrent callers for one key exactly one gets a 2xx; every loser
    * gets 412 (name exists) or 409 (lost to an in-flight conditional
    * write) and this throws [[ObjectAlreadyExists]]. A PUT is
    * all-or-nothing on an S3-class store, so there is no torn-read
    * window: the key either serves the complete body or does not exist
    * — which is exactly [[graft.operators.LogStore]]'s publish contract
    * (ObjectStoreLogStore rides this). Single-part only by design:
    * manifests are KB-sized; a multipart object cannot claim a name
    * atomically at initiate time. */
  def putIfAbsent(baseUrl: String, bucket: String, key: String,
      bytes: Array[Byte]): PutResult = {
    val (code, respBody, respHeaders) = request(
      "PUT", objectUrl(baseUrl, bucket, key), bytes, Some(CONTENT_TYPE),
      reqHeaders = Map("If-None-Match" -> "*"))
    if (code == 412 || code == 409)
      throw new ObjectAlreadyExists(
        s"conditional PUT $bucket/$key refused: HTTP $code $respBody")
    require(code >= 200 && code < 300,
      s"conditional PUT $bucket/$key failed: HTTP $code $respBody")
    PutResult(key, bytes.length.toLong, 0, respHeaders.getOrElse("etag", ""))
  }

  /** Ship one local file to `bucket/key`. Single PUT when the file fits
    * in one chunk; the three-phase multipart protocol otherwise — part
    * numbers start at 1, each part's ETag is echoed back in the complete
    * request, exactly the sequence minio.rs:166–242 drives through the
    * AWS SDK. A failed part or complete ABORTS the upload (DELETE with
    * the uploadId) before rethrowing: without the abort, a real store
    * holds the staged parts — billed, invisible to LIST — until a
    * lifecycle rule expires them. */
  def putFile(baseUrl: String, bucket: String, key: String, file: File,
      chunkSize: Int = CHUNK_SIZE): PutResult = {
    val size = file.length()
    val objUrl = objectUrl(baseUrl, bucket, key)
    if (size <= chunkSize) {
      val bytes = java.nio.file.Files.readAllBytes(file.toPath)
      val (_, headers) = expectOk(s"PUT $key")(
        request("PUT", objUrl, bytes, Some(CONTENT_TYPE)))
      PutResult(key, size, 0, headers.getOrElse("etag", ""))
    } else {
      val (initBody, _) = expectOk(s"initiate $key")(
        request("POST", s"$objUrl?uploads", contentType = Some(CONTENT_TYPE)))
      val uploadId = "<UploadId>(.*?)</UploadId>".r
        .findFirstMatchIn(initBody)
        .map(_.group(1))
        .getOrElse(sys.error(s"initiate $key returned no UploadId: $initBody"))
      var completed = false
      try {
        val in = new FileInputStream(file)
        val etags = Seq.newBuilder[(Int, String)]
        try {
          val buf = new Array[Byte](chunkSize)
          var part = 1
          var n = in.readNBytes(buf, 0, chunkSize)
          while (n > 0) {
            val (_, headers) = expectOk(s"part $part of $key")(
              request("PUT", s"$objUrl?partNumber=$part&uploadId=$uploadId",
                java.util.Arrays.copyOf(buf, n)))
            etags += part -> headers.getOrElse("etag", "")
            part += 1
            n = in.readNBytes(buf, 0, chunkSize)
          }
        } finally in.close()
        val parts = etags.result()
        val completeXml = parts
          .map { case (p, e) => s"<Part><PartNumber>$p</PartNumber><ETag>$e</ETag></Part>" }
          .mkString("<CompleteMultipartUpload>", "", "</CompleteMultipartUpload>")
        val (doneBody, _) = expectOk(s"complete $key")(
          request("POST", s"$objUrl?uploadId=$uploadId",
            completeXml.getBytes("UTF-8"), Some("application/xml")))
        val etag = "<ETag>(.*?)</ETag>".r.findFirstMatchIn(doneBody)
          .map(_.group(1)).getOrElse("")
        completed = true
        PutResult(key, size, parts.size, etag)
      } finally if (!completed) {
        // best-effort: the primary failure is what propagates; an abort
        // that itself fails (store down, network gone) must not mask it
        try request("DELETE", s"$objUrl?uploadId=$uploadId")
        catch { case _: Exception => () }
      }
    }
  }

  /** S8 entry: ship every data file of a written parquet spool dir to
    * `bucket/prefix/` — the upload fans out over the cluster (one task
    * per file batch, each task uploading its own files) and only the
    * manifest returns to the driver. Returns (key, size, parts, etag)
    * ordered by key. */
  def s8UploadDir(spark: SparkSession, localDir: String, baseUrl: String,
      bucket: String, prefix: String, chunkSize: Int = CHUNK_SIZE): DataFrame = {
    import spark.implicits._
    headBucket(baseUrl, bucket)
    val files = Option(new File(localDir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath)
      .sorted
      .toSeq
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 8)))
      .map { path =>
        val f = new File(path)
        putFile(baseUrl, bucket, s"$prefix/${f.getName}", f, chunkSize)
      }
      .toDF()
      .orderBy($"key")
  }
}
