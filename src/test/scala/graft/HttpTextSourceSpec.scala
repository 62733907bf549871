package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HttpTextSource

/** S6 live-RPC source against an in-process fake lang-detector (JDK
  * built-in HttpServer): request shape, sentence join, lang filter
  * propagation, and the loud non-200 failure path.
  */
class HttpTextSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fetches per-row, joins sentence arrays, fails loudly on non-200") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // expected shape: /<target>/<id>?filter=<lang>
        val id = ex.getRequestURI.getPath.split("/").last.toLong
        if (ex.getRequestURI.getQuery != "filter=en")
          respond(ex, 400, "missing filter")
        else if (id == 13L) respond(ex, 500, "boom")
        else respond(ex, 200, s"""{"text": ["post $id", "sentence two"]}""")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val posts = Seq(("posts", 1L), ("posts", 2L)).toDF("target", "doc_id")
      val got = HttpTextSource.fetchTexts(posts, base, "en")
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      assert(got === Seq(
        (1L, "post 1 sentence two"), (2L, "post 2 sentence two")))
      // non-200 must surface as a task failure (reference raises), not
      // a silently dropped row
      val bad = Seq(("posts", 13L)).toDF("target", "doc_id")
      val e = intercept[Exception] {
        HttpTextSource.fetchTexts(bad, base, "en").collect()
      }
      assert(e.getMessage.contains("lang-detector") ||
        Option(e.getCause).exists(_.getMessage.contains("lang-detector")))
    } finally server.stop(0)
  }
}
