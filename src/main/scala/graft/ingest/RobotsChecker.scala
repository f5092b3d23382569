package graft.ingest

import java.net.URI
import java.time.{Clock, Instant}
import scala.collection.mutable

/** robots.txt compliance checker (ethical_crawler.py:203–266).
  *
  * The parse is a pure function ([[RobotsChecker.parse]]) so the
  * grammar is unit-testable without network; fetching + the 24 h
  * per-domain cache (:210–214) wrap it. Reference semantics kept:
  *  - only `User-agent` / `Disallow` lines are honored (:241–248);
  *  - a UA section matches on `*` or case-insensitive exact name;
  *  - empty Disallow is ignored (:247);
  *  - deny iff the URL path prefix-matches any disallowed path
  *    (:251–254);
  *  - missing robots.txt (non-200) or fetch failure → allowed
  *    (:258–263).
  */
object RobotsChecker {

  final case class Rules(disallowedFor: Map[String, Seq[String]]) {

    /** Paths disallowed for `userAgent`: its own section plus `*`. */
    def disallowed(userAgent: String): Seq[String] =
      disallowedFor.getOrElse(userAgent.toLowerCase, Seq.empty) ++
        disallowedFor.getOrElse("*", Seq.empty)

    def canFetch(userAgent: String, path: String): Boolean =
      !disallowed(userAgent).exists(path.startsWith)
  }

  /** Parse robots.txt content into per-UA disallow lists. */
  def parse(content: String): Rules = {
    val acc = mutable.LinkedHashMap.empty[String, Vector[String]]
    var currentUa: Option[String] = None
    content.split('\n').map(_.trim).foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:")) {
        currentUa = Some(line.split(":", 2)(1).trim.toLowerCase)
        acc.getOrElseUpdate(currentUa.get, Vector.empty)
      } else if (lower.startsWith("disallow:") && currentUa.isDefined) {
        val path = line.split(":", 2)(1).trim
        if (path.nonEmpty)
          acc(currentUa.get) = acc(currentUa.get) :+ path
      }
    }
    Rules(acc.toMap)
  }
}

final class RobotsChecker(
    fetcher: HttpFetcher,
    clock: Clock = Clock.systemUTC(),
    cacheTtlHours: Long = 24) {

  private val cache =
    mutable.Map.empty[String, (RobotsChecker.Rules, Instant)]

  /** True iff `userAgent` may fetch `url` per the domain's robots.txt. */
  def canFetch(url: String,
      userAgent: String = "EthicalDataBot/1.0"): Boolean = {
    try {
      val uri = URI.create(url)
      val domain = s"${uri.getScheme}://${uri.getAuthority}"
      val path = Option(uri.getPath).filter(_.nonEmpty).getOrElse("/")
      val now = clock.instant()
      val rules = cache.get(domain) match {
        case Some((r, at))
            if now.isBefore(at.plusSeconds(cacheTtlHours * 3600)) => r
        case _ =>
          val fetched = fetcher.get(s"$domain/robots.txt") match {
            case Right((200, body)) => RobotsChecker.parse(body)
            // Missing/unfetchable robots.txt → allowed (reference
            // :258–263), modeled as an empty rule set.
            case _ => RobotsChecker.Rules(Map.empty)
          }
          cache(domain) = (fetched, now)
          fetched
      }
      rules.canFetch(userAgent, path)
    } catch {
      case _: Exception => true // default-allow on checker error (:264–266)
    }
  }
}
