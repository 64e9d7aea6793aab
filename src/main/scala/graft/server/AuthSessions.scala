package graft.server

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/**
 * Session-based authentication for the serving facades — the Spark-side
 * analog of the reference's auth subsystem: a login produces a session id
 * delivered as the `TSESSIONID` cookie (reference
 * common/src/main/java/timely/netty/Constants.java:10,
 * TimelyLoginRequestHandler.java:44-58), later requests carry the cookie and
 * resolve to the subject's authorizations
 * (HttpRequestDecoder.java:57-75,120-131, DataStore.getSessionAuthorizations
 * -> AuthenticationService, DataStore.java:1045-1047), and an unknown/absent
 * session falls back to the anonymous principal — no authorizations, so the
 * visibility filter serves only unlabeled points — or is refused outright
 * when anonymous access is disabled (SecurityProperties.allowAnonymousHttpAccess /
 * allowAnonymousWsAccess, exercised by WebSocketClientIT.testClientAnonymousAccess).
 *
 * The reference authenticates X509 DNs against Accumulo-side auth services;
 * this engine has no PKI in scope, so the credential store is a plain
 * username -> (password, authorizations) map supplied by the embedder — the
 * session/cookie/authorization wiring downstream of the credential check is
 * the part the facades share with the reference.
 */
class AuthSessions(
    users: Map[String, AuthSessions.User],
    val allowAnonymous: Boolean = false,
    sessionMaxAgeMs: Long = 8L * 3600 * 1000,
    nowMs: () => Long = () => System.currentTimeMillis()) {

  private case class Session(auths: Seq[String], expiresAt: Long)
  private val sessions = new ConcurrentHashMap[String, Session]()

  /** Authenticate; on success mint a session id (the reference mints a UUID
    * per login — TimelyLoginRequestHandler.java:44). None = bad credentials. */
  def login(username: String, password: String): Option[String] =
    users.get(username).filter(_.password == password).map { u =>
      val id = UUID.randomUUID().toString
      sessions.put(id, Session(u.auths, nowMs() + sessionMaxAgeMs))
      id
    }

  /**
   * Resolve a request's session to authorizations.
   *  - live session        -> Some(its auths)
   *  - absent/unknown/expired + anonymous allowed -> Some(Nil) (anonymous
   *    principal: the viz filter then passes only unlabeled points)
   *  - otherwise           -> None (the facade answers 401)
   */
  def resolve(sessionId: Option[String]): Option[Seq[String]] = {
    val live = sessionId.flatMap { id =>
      Option(sessions.get(id)).flatMap { s =>
        if (s.expiresAt > nowMs()) Some(s.auths)
        else { sessions.remove(id); None }
      }
    }
    live.orElse(if (allowAnonymous) Some(Seq.empty) else None)
  }

  /** Explicit logout (session invalidation). */
  def invalidate(sessionId: String): Unit = sessions.remove(sessionId)
}

object AuthSessions {
  /** One credential entry: password + the subject's visibility authorizations. */
  case class User(password: String, auths: Seq[String])

  /** The reference's session cookie name (Constants.java:10). */
  val CookieName = "TSESSIONID"

  /** Extract the session id from a `Cookie` header value (first TSESSIONID,
    * like HttpRequestDecoder.getSessionId). */
  def sessionFromCookie(cookieHeader: Option[String]): Option[String] =
    cookieHeader.flatMap { h =>
      h.split(";").iterator.map(_.trim).collectFirst {
        case c if c.startsWith(CookieName + "=") =>
          c.substring(CookieName.length + 1)
      }
    }
}
