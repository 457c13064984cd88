package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

/** Sustained-load driver for the packaged serving app (`graft.ServeMain`):
  * POSTs CDP events at a target rate over real HTTP with SSE clients
  * attached, samples the server's own metric surface (`/stats/cdp`), and
  * prints one JSON summary line — the soak that closes the gap between
  * "the e2e specs pass" and "the server runs for ten minutes at 1k rps".
  *
  * Pure JDK HTTP client, no Spark: runs as `java -cp <classes>:<scala-lib>
  * graft.SoakDriver <baseUrl> [rps] [durationSec] [senders]` against an
  * already-running server (so the two JVMs never share an sbt lock).
  *
  * Workload: IDENTIFY every 10th event, ~5% duplicate eventIds (dedup
  * exercise), ~5% events stamped 2 minutes late (lateness classes), user
  * ids cycling a 20k-profile population (summaries-map eviction stays
  * un-triggered below MaxProfiles=10k only if users < 10k — 20k users
  * forces the eviction path the bounded map exists for). The entity
  * simulator is started at the same rate so the alert path runs too.
  */
object SoakDriver {

  private def pct(sorted: Array[Long], p: Double): Long =
    if (sorted.isEmpty) -1L
    else sorted(math.min(sorted.length - 1,
      math.max(0, math.ceil(p * sorted.length).toInt - 1)))

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("http://localhost:8765")
    val rps = if (args.length > 1) args(1).toInt else 1000
    val durationSec = if (args.length > 2) args(2).toInt else 600
    val senders = if (args.length > 3) args(3).toInt else 8
    val users = 20000

    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5)).build()
    def post(path: String, body: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    def get(path: String): String =
      client.send(HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()

    require(get("/health").contains("UP"), s"server at $base is not healthy")

    // ---- SSE clients (alerts + segments + profiles), counting data frames
    val sseCounts = Seq("alerts", "segments", "profiles")
      .map(_ -> new AtomicLong(0L)).toMap
    def sseThread(name: String, path: String): Thread = {
      val t = new Thread(() => {
        try {
          val resp = client.send(
            HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
            HttpResponse.BodyHandlers.ofInputStream())
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(resp.body(), StandardCharsets.UTF_8))
          var line = br.readLine()
          while (line != null) {
            if (line.startsWith("data:")) { sseCounts(name).incrementAndGet(); () }
            line = br.readLine()
          }
        } catch { case _: Throwable => () } // soak end closes the socket
      }, s"sse-$name")
      t.setDaemon(true); t.start(); t
    }
    sseThread("alerts", "/sse/alerts")
    sseThread("segments", "/sse/cdp/segments")
    sseThread("profiles", "/sse/cdp/profiles")

    println(s"[soak] sim/start: ${post(s"/sim/start?rps=$rps", "").body()}")

    // ---- CDP senders: each paces its share in 100 ms slots
    val sent = new AtomicLong(0L)
    val accepted = new AtomicLong(0L)
    val rejected = new AtomicLong(0L)
    val deadline = System.nanoTime() + durationSec * 1000000000L
    val latencies = Array.fill(senders)(
      new scala.collection.mutable.ArrayBuffer[Long]())
    val threads = (0 until senders).map { s =>
      val t = new Thread(() => {
        // schedule-based pacing: the n-th event of this thread is due at
        // start + n/perSec — no rounding loss at any rps/senders ratio
        val perSec = rps.toDouble / senders
        val start = System.nanoTime()
        var n = 0L
        val lat = latencies(s)
        var i = s.toLong * 1000000000L
        while (System.nanoTime() < deadline) {
          val due = start + (n / perSec * 1e9).toLong
          val wait = due - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          if (System.nanoTime() < deadline) {
            // ~5% duplicate ids (re-send the previous event id), ~5% late
            val dup = i % 20 == 3
            val id = if (dup) s"s${s}e${i - 1}" else s"s${s}e$i"
            val lateMs = if (i % 20 == 7) 120000L else 0L
            val ts = java.time.Instant.ofEpochMilli(
              System.currentTimeMillis() - lateMs).toString
            val user = s"u${i % users}"
            val body =
              if (i % 10 == 0)
                s"""{"eventId":"$id","ts":"$ts","payload":{"type":"IDENTIFY","userId":"$user","traits":{"plan":"${if (i % 20 == 0) "pro" else "free"}"}}}"""
              else
                s"""{"eventId":"$id","ts":"$ts","payload":{"type":"TRACK","userId":"$user","name":"feature_used"}}"""
            val t0 = System.nanoTime()
            try {
              val code = post("/cdp/ingest", body).statusCode()
              lat += (System.nanoTime() - t0) / 1000L // µs
              if (code == 202) accepted.incrementAndGet()
              else rejected.incrementAndGet()
            } catch { case _: Throwable => rejected.incrementAndGet() }
            sent.incrementAndGet()
            i += 1; n += 1
          }
        }
      }, s"sender-$s")
      t.start(); t
    }

    // ---- sampler: the server's own metric surface, every 15 s
    val profilesMax = new AtomicLong(0L)
    @volatile var lastStats = ""
    val sampler = new Thread(() => {
      val re = """"([a-z._0-9]+)":(-?\d+)""".r
      while (System.nanoTime() < deadline) {
        try {
          val s = get("/stats/cdp")
          lastStats = s
          val m = re.findAllMatchIn(s).map(x => x.group(1) -> x.group(2).toLong).toMap
          m.get("cdp.profiles.total").foreach(v =>
            profilesMax.updateAndGet(c => math.max(c, v)))
          val t = durationSec - (deadline - System.nanoTime()) / 1000000000L
          println(s"[soak] t=${t}s processed=${m.getOrElse("cdp.events.processed", -1L)} " +
            s"late=${m.getOrElse("cdp.events.late", -1L)} " +
            s"profiles=${m.getOrElse("cdp.profiles.total", -1L)} " +
            s"wm_lag_ms=${m.getOrElse("cdp.watermark.lag_ms", -1L)} " +
            s"batch_p50=${m.getOrElse("cdp.batch.p50_ms", -1L)} " +
            s"batch_p99=${m.getOrElse("cdp.batch.p99_ms", -1L)} " +
            s"sent=${sent.get()}")
        } catch { case e: Throwable =>
          System.err.println(s"[soak] sample failed: ${e.getMessage}")
        }
        Thread.sleep(15000L)
      }
    }, "sampler")
    sampler.setDaemon(true); sampler.start()

    threads.foreach(_.join())
    // let the stream drain the tail, then take the closing snapshot
    Thread.sleep(5000L)
    val closing = get("/stats/cdp")
    println(s"[soak] sim/stop: ${post("/sim/stop", "").body()}")

    val all = latencies.flatMap(_.iterator).sorted
    println(s"""{"metric":"cdp_soak","rps":$rps,"duration_sec":$durationSec,"sent":${sent.get()},"accepted":${accepted.get()},"rejected":${rejected.get()},"post_p50_us":${pct(all, 0.5)},"post_p99_us":${pct(all, 0.99)},"sse_alert_frames":${sseCounts("alerts").get()},"sse_segment_frames":${sseCounts("segments").get()},"sse_profile_frames":${sseCounts("profiles").get()},"profiles_max":${profilesMax.get()},"closing":$closing}""")
  }
}
