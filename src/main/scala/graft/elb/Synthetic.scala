package graft.elb

import scala.util.Random

/** Deterministic synthetic ELB access-log generator — replaces the
  * reference's stripped data blob (/root/reference/.MISSING_LARGE_BLOBS:1)
  * so parser/sessionizer tests never depend on missing data (FIXTURES.md §B).
  *
  * Per client: a hit process mixing intra-session gaps (< 15 min) and
  * inter-session gaps (> 15 min), so expected session counts are computable
  * by construction; URL pool with per-client reuse so unique-URLs-per-
  * session < hits. Optional malformed lines exercise the quarantine path.
  */
object Synthetic {

  private val baseEpochSec = 1437555600L // 2015-07-22T09:00:00Z, the sample day

  private val urls = (0 until 40).map(i => s"https://example.shop:443/item/$i")
  private val agents = Seq(
    "Mozilla/5.0 (Windows NT 6.1; WOW64) AppleWebKit/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10_4) Safari/600.7.12",
    "curl/7.38.0",
    "\"quoted\" agent with spaces") // embedded quotes — messy-data case

  private def fmtTs(epochMicros: Long): String = {
    val sec = epochMicros / 1000000L
    val micros = epochMicros % 1000000L
    val i = java.time.Instant.ofEpochSecond(sec)
    val base = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(i)
    f"$base.$micros%06dZ"
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** One well-formed line. */
  def line(rng: Random, epochMicros: Long, clientIp: String): String = {
    val port = 30000 + rng.nextInt(30000)
    val url = urls(rng.nextInt(urls.length))
    val method = if (rng.nextDouble() < 0.8) "GET" else "POST"
    val status = if (rng.nextDouble() < 0.95) 200 else 500
    val timedOut = rng.nextDouble() < 0.02
    val (beAddr, reqT, beT, respT, beStatus) =
      if (timedOut) ("-", "-1", "-1", "-1", "-")
      else (s"10.0.4.${rng.nextInt(250)}:80",
        f"${rng.nextDouble() * 0.001}%.6f", f"${rng.nextDouble() * 0.1}%.6f",
        f"${rng.nextDouble() * 0.001}%.6f", status.toString)
    val ua = agents(rng.nextInt(agents.length))
    Seq(
      fmtTs(epochMicros), "marketpalce-shop", s"$clientIp:$port", beAddr,
      reqT, beT, respT, status.toString, beStatus,
      rng.nextInt(2000).toString, rng.nextInt(100000).toString,
      quote(s"$method $url HTTP/1.1"), quote(ua),
      "ECDHE-RSA-AES128-GCM-SHA256", "TLSv1.2"
    ).mkString(" ")
  }

  /** Generate lines for `nClients` clients, each with `sessionsPerClient`
    * sessions of `hitsPerSession` hits. Intra-session gaps are 10-120 s,
    * inter-session gaps 16-60 min — so the expected session count under a
    * 15-minute-gap sessionizer is EXACTLY nClients * sessionsPerClient.
    * Deterministic under `seed`.
    */
  def generate(seed: Long = 42L, nClients: Int = 20,
               sessionsPerClient: Int = 3, hitsPerSession: Int = 5,
               malformedEvery: Int = 0): Seq[String] = {
    val rng = new Random(seed)
    val out = Seq.newBuilder[String]
    var n = 0
    for (c <- 0 until nClients) {
      val ip = s"106.51.${c / 250}.${c % 250}"
      var t = baseEpochSec * 1000000L + rng.nextInt(600) * 1000000L
      for (_ <- 0 until sessionsPerClient) {
        for (_ <- 0 until hitsPerSession) {
          n += 1
          if (malformedEvery > 0 && n % malformedEvery == 0)
            out += corruptLine(rng)
          else out += line(rng, t, ip)
          t += (10 + rng.nextInt(110)) * 1000000L // 10-120 s: same session
        }
        t += (16 + rng.nextInt(45)) * 60L * 1000000L // 16-60 min: new session
      }
    }
    out.result()
  }

  /** Malformed variants for quarantine tests: truncated, bad timestamp,
    * garbage. */
  def corruptLine(rng: Random): String = rng.nextInt(3) match {
    case 0 => "2015-07-22T09:00:28.019143Z marketpalce-shop 1.2.3.4:1" // truncated
    case 1 => line(rng, 0, "1.2.3.4").replaceFirst("^\\S+", "not-a-timestamp")
    case _ => "%%% total garbage line %%%"
  }
}
