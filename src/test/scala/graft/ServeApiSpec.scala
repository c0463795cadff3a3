package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import graft.functions.GzipCodec
import graft.serve.ServeApi
import graft.snapshot.SnapshotFold
import graft.store.IcebergLikeTable

/** The serving facade end-to-end over real HTTP: the reference's REST
  * route surface (restapi/RestApi.scala:41-130 + dump control :150-228)
  * against a real snapshot table — point lookup must return the SAME
  * resolved row as the Q1 lookup path, dumps must run/conflict/abort
  * through the lifecycle registry, gzip negotiation must round-trip.
  */
class ServeApiSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String, headers: (String, String)*): HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }
  private def send(port: Int, method: String, path: String, body: String = ""): HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
    client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }
  private def text(r: HttpResponse[Array[Byte]]): String =
    new String(r.body(), StandardCharsets.UTF_8)

  private def mkTable(tag: String): IcebergLikeTable = {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val turns = Seq(
      model.Turn("c-1", 1, "user", "hello", "", ts(1000L)),
      model.Turn("c-1", 2, "assistant", "world", "search", ts(2000L)),
      model.Turn("c-2", 1, "user", "solo", "", ts(1500L)))
    val t = new IcebergLikeTable(tmpDir(tag) + "/t", 4)
    t.merge(SnapshotFold.typedSnapshots(spark.createDataset(turns)).toDF(),
      "conv_id", 0L)
    t
  }

  test("routes: ping, snapshot list, point lookup (hit/miss/unknown), gzip") {
    val table = mkTable("serve-basic")
    val api = new ServeApi(Map("conversations" -> ServeApi.Target(table)))
    val port = api.start()
    try {
      assert(text(get(port, "/health/ping")) === "ok")

      val list = get(port, "/snapshots")
      assert(list.statusCode() === 200)
      assert(text(list) === """["conversations"]""")

      // hit: same row the Q1 lookup path resolves (last-writer-wins fold)
      val hit = get(port, "/snapshots/conversations/entities/c-1")
      assert(hit.statusCode() === 200)
      val expected = table.lookup("conv_id", "c-1").toJSON.collect().head
      assert(text(hit) === expected)

      assert(get(port, "/snapshots/conversations/entities/nope").statusCode() === 404)
      assert(get(port, "/snapshots/wrong/entities/c-1").statusCode() === 404)
      assert(get(port, "/nope").statusCode() === 404)

      // gzip negotiation: Content-Encoding set, payload round-trips
      val gz = get(port, "/snapshots/conversations/entities/c-1",
        "Accept-Encoding" -> "gzip")
      assert(gz.headers().firstValue("Content-Encoding").orElse("") === "gzip")
      assert(GzipCodec.decompress(gz.body()) === expected)
    } finally api.stop()
  }

  test("dump lifecycle over HTTP: start → status → list; conflict 409; abort") {
    val table = mkTable("serve-dump")
    val acc = spark.sparkContext.collectionAccumulator[String]("served-dump")
    val api = new ServeApi(Map(
      "conversations" -> ServeApi.Target(table, it => it.foreach(acc.add))))
    val port = api.start()
    try {
      val started = send(port, "POST", "/snapshots/conversations/dump")
      assert(started.statusCode() === 202)
      val uid = """"dumpUid": "([^"]+)"""".r
        .findFirstMatchIn(text(started)).get.group(1)

      // poll to terminal state (async runner)
      var st = ""
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (st != "FinishedSuccessfully" && System.nanoTime() < deadline) {
        st = """"status": "([^"]+)"""".r
          .findFirstMatchIn(text(get(port, s"/dumps/$uid"))).get.group(1)
        if (st != "FinishedSuccessfully") Thread.sleep(50)
      }
      assert(st === "FinishedSuccessfully")
      assert(acc.value.asScala.toSet === Set("c-1", "c-2"))
      assert(text(get(port, "/dumps")).contains(uid))
      assert(get(port, "/dumps/dump-99999999").statusCode() === 404)

      // conflict: occupy the target, POST again → 409 carrying the running uid
      val blocking = api.manager.start("conversations")
      val conflict = send(port, "POST", "/snapshots/conversations/dump")
      assert(conflict.statusCode() === 409)
      assert(text(conflict).contains(blocking))

      // abort via PATCH flips the registry state
      val patched = send(port, "PATCH", s"/dumps/$blocking",
        """{"status": "aborted"}""")
      assert(patched.statusCode() === 200)
      assert(text(patched).contains("Aborted"))
      assert(api.manager.status(blocking) === graft.ops.DumpStatus.Aborted)
      // abort of a non-running dump → 404; bad status → 400
      assert(send(port, "PATCH", s"/dumps/$blocking",
        """{"status": "aborted"}""").statusCode() === 404)
      assert(send(port, "PATCH", s"/dumps/$uid",
        """{"status": "paused"}""").statusCode() === 400)
    } finally api.stop()
  }
}
