package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.psn._

/** Gates the production HTTP boundary (SURVEY §2.1 S1/S2/S5, §2.7 E10;
  * reference main.py:304-320, 85-91) against a local fixture server: the
  * same JSON shapes PSNAWP would return, served by the JDK's HttpServer.
  * Closes the two seams VERDICT r6 flagged: a real `java.net.http` client
  * behind [[PsnClient]], and a spec-gated env→sanitize→client config path.
  */
class HttpPsnClientSpec extends AnyFunSuite {
  import TestSpark._

  private val fake = FakePsnClient.default

  /** JSON for one fixture page of titles [from, until). */
  private def titlesPage(from: Int, limit: Int): String = {
    val all = fake.titleStats()
    val page = all.slice(from, from + limit).map { g =>
      s"""{"titleId":"${g.title_id}","name":"${g.name}",
         |"imageUrl":"${g.image_url}","category":"${g.category}",
         |"firstPlayedDateTime":"${g.first_played_date_time.toInstant}",
         |"lastPlayedDateTime":"${g.last_played_date_time.toInstant}",
         |"playCount":${g.play_count},
         |"playDuration":"${g.play_duration}"}""".stripMargin
    }.mkString(",")
    val next =
      if (from + limit >= all.size) "null" else (from + limit).toString
    s"""{"titles":[$page],"nextOffset":$next,"totalItemCount":${all.size}}"""
  }

  private val profileJson = {
    val t = fake.profileTrophies()
    s"""{"profile":{"trophySummary":{"earnedTrophies":
       |{"bronze":${t.bronze},"silver":${t.silver},
       |"gold":${t.gold},"platinum":${t.platinum}}}}}""".stripMargin
  }

  /** Runs `body` against a live fixture server; records every request's
    * (path, Authorization header). */
  private def withServer[A](body: String => A): (A, Seq[(String, String)]) = {
    val seen = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, json: String): Unit = {
      val bytes = json.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/profile", (ex: HttpExchange) => {
      seen.add((ex.getRequestURI.toString,
        ex.getRequestHeaders.getFirst("Authorization")))
      reply(ex, profileJson)
    })
    server.createContext("/titles", (ex: HttpExchange) => {
      seen.add((ex.getRequestURI.toString,
        ex.getRequestHeaders.getFirst("Authorization")))
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val kv = q.split("&").filter(_.contains("="))
        .map { p => val Array(k, v) = p.split("=", 2); k -> v }.toMap
      reply(ex, titlesPage(kv("offset").toInt, kv("limit").toInt))
    })
    server.start()
    try {
      val r = body(s"http://127.0.0.1:${server.getAddress.getPort}")
      (r, seen.asScala.toSeq)
    } finally server.stop(0)
  }

  test("HTTP client reproduces the fake across a paged fixture API") {
    val ((trophies, titles), requests) = withServer { base =>
      val c = new HttpPsnClient(base, "tok", pageSize = 2)
      (c.profileTrophies(), c.titleStats())
    }
    assert(trophies == fake.profileTrophies())
    assert(titles == fake.titleStats())
    // 3 titles at limit=2 → exactly two /titles pages were fetched
    assert(requests.count(_._1.startsWith("/titles")) == 2)
  }

  test("titleCount reads metadata via a single record-free request") {
    val (n, requests) = withServer { base =>
      new HttpPsnClient(base, "tok", pageSize = 2).titleCount()
    }
    assert(n == fake.titleStats().size)
    // one limit-0 request, no record-bearing page fetch
    assert(requests.map(_._1) == Seq("/titles?offset=0&limit=0"))
  }

  test("S5 config path: env token is sanitized before reaching the wire") {
    // main.py:311-313: non-ASCII runs → space, newlines dropped, trimmed
    val env = Map("psn" -> "  abéécd\nef  ")
    assert(PsnConfig.tokenFrom(env).contains("ab cdef"))
    assert(PsnConfig.tokenFrom(Map.empty).isEmpty)
    assert(PsnConfig.tokenFrom(Map("psn" -> " \n ")).isEmpty)

    val (_, requests) = withServer { base =>
      PsnConfig.clientFrom(env, base).profileTrophies()
    }
    assert(requests.nonEmpty &&
      requests.forall(_._2 == "Bearer ab cdef"))

    val err = intercept[IllegalStateException] {
      PsnConfig.clientFrom(Map.empty, "http://unused")
    }
    assert(err.getMessage.contains("psn"))
  }

  test("fixture-server JSON through DailyRun matches the FakePsnClient run") {
    val (whHttp, _) = withServer { base =>
      val client = new HttpPsnClient(base, "tok", pageSize = 2)
      val wh = Files.createTempDirectory("psn_http_wh").toString
      val store = new TableStore(spark, wh)
      Bootstrap.run(spark, client, store)
      DailyRun.run(spark, client, store)
      wh
    }
    val whFake = Files.createTempDirectory("psn_fake_wh").toString
    val storeFake = new TableStore(spark, whFake)
    Bootstrap.run(spark, fake, storeFake)
    DailyRun.run(spark, fake, storeFake)

    val storeHttp = new TableStore(spark, whHttp)
    // identical day-1 data → zero deltas → no time_play table on either side
    for (t <- Seq("game", "trophee")) {
      val a = storeHttp.read(t)
      val b = storeFake.read(t)
      val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col)
      assert(a.select(cols: _*).collect().sortBy(_.toString).toSeq ==
        b.select(cols: _*).collect().sortBy(_.toString).toSeq,
        s"table $t diverges between HTTP and fake ingestion")
    }
  }
}
