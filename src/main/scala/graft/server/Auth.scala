package graft.server

import io.jsonwebtoken.Jwts
import io.jsonwebtoken.security.Keys
import javax.crypto.SecretKey
import scala.jdk.CollectionConverters._

/** Authentication + authorization for the serving facades, mirroring the
  * reference's `authn`/`authz` packages.
  *
  * Authn (`reference/authn/authenticate.go:172-237`): a JWT access token
  * carries `oid` (user id) and `name` claims; expiry is enforced. The
  * reference leaves signature validation to the IdP round-trip that fetches
  * group membership (`authenticate.go:186-188` uses ParseUnverified; groups
  * come from the OAuth2 group endpoint, `authenticate.go:300-344`). This
  * container has no IdP, so the trust roles flip in our favor: the token's
  * HMAC-SHA256 signature IS verified against the configured secret key (the
  * reference's `Auth.secretKey`, `authenticate.go:93-111`), and group
  * membership rides in a `groups` claim with the same `{id, displayName}`
  * member shape the IdP returns (`authenticate.go:64-68`). A deployment
  * against a real IdP swaps [[TokenVerifier]] for one that calls the group
  * endpoint — [[GroupPermissions]] and the facade wiring are unchanged.
  *
  * Authz (`reference/authz/authorization.go`): a YAML permissions file maps
  * group id → index → permission with a designated admin group; the
  * permission lattice and every error message below follow it line-for-line.
  */
object Auth {

  /** `reference/authn/authenticate.go:64-68`. */
  final case class Group(groupId: String, groupName: String = "")

  /** `reference/authn/authenticate.go:54-62` (token plumbing omitted). */
  final case class UserInfo(userId: String, userName: String, groups: Seq[Group])

  final class AuthError(message: String) extends RuntimeException(message)

  /** Permission lattice, `reference/authz/authorization.go:20-41`. */
  sealed abstract class Permission(val name: String, private val rank: Int) {
    /** Whether `this` satisfies the permission required by `b`
      * (`authorization.go:30-41` Satisfies). */
    def satisfies(b: Permission): Boolean = b.rank <= rank
    override def toString: String = name
  }
  case object PermNone  extends Permission("", 0)
  case object PermRead  extends Permission("read", 1)
  case object PermWrite extends Permission("write", 2)
  case object PermAdmin extends Permission("admin", 3)

  object Permission {
    def parse(s: String): Permission = s match {
      case ""      => PermNone
      case "read"  => PermRead
      case "write" => PermWrite
      case "admin" => PermAdmin
      case other   => throw new AuthError(s"unknown permission '$other'")
    }
  }

  /** HS256 JWT verify + claim extraction. Token mint ([[sign]]) is provided
    * for tests and dev tooling — production tokens come from the IdP. */
  final class TokenVerifier(secret: Array[Byte]) {
    private val key: SecretKey = Keys.hmacShaKeyFor(secret)

    /** `authenticate.go:172-237` Authenticate: well-formed-ness, expiry
      * (jjwt enforces `exp` on verified parse), then claim extraction. */
    def authenticate(access: String): UserInfo = {
      if (access == null || access.isEmpty)
        throw new AuthError("auth token is empty")
      val claims =
        try Jwts.parser().verifyWith(key).build()
          .parseSignedClaims(access).getPayload
        catch { case e: Exception =>
          throw new AuthError(s"parsing auth token: ${e.getMessage}")
        }
      val groups = claims.get("groups", classOf[java.util.List[_]]) match {
        case null => Seq.empty[Group]
        case l => l.asScala.toSeq.map {
          case m: java.util.Map[_, _] =>
            val g = m.asInstanceOf[java.util.Map[String, Any]]
            Group(String.valueOf(g.getOrDefault("id", "")),
                  String.valueOf(g.getOrDefault("displayName", "")))
          case s => Group(String.valueOf(s))
        }
      }
      UserInfo(
        userId = Option(claims.get("oid", classOf[String])).getOrElse(""),
        userName = Option(claims.get("name", classOf[String])).getOrElse(""),
        groups = groups)
    }
  }

  object TokenVerifier {
    /** Mint a test/dev token carrying the reference's claim shape. */
    def sign(secret: Array[Byte], userId: String, userName: String,
             groups: Seq[Group], ttlSeconds: Long = 3600): String = {
      val claims = new java.util.HashMap[String, AnyRef]()
      claims.put("oid", userId)
      claims.put("name", userName)
      claims.put("groups", groups.map { g =>
        val m = new java.util.HashMap[String, String]()
        m.put("id", g.groupId); m.put("displayName", g.groupName); m
      }.asJava)
      Jwts.builder().claims(claims)
        .expiration(java.util.Date.from(
          java.time.Instant.now().plusSeconds(ttlSeconds)))
        .signWith(Keys.hmacShaKeyFor(secret)).compact()
    }
  }

  /** Group → index → permission map with a designated admin group,
    * `reference/authz/authorization.go:16-28`. */
  final class GroupPermissions(
      val permissions: Map[String, Map[String, Permission]],
      val admin: String) {

    /** `authorization.go:100-107` IsAdmin. */
    def isAdmin(groups: Seq[Group]): Boolean =
      groups.exists(_.groupId == admin)

    /** `authorization.go:59-98` GetPermissions: admin short-circuits; a
      * group that appears in the file but lacks the index is an immediate
      * denial; groups absent from the file accumulate toward the
      * all-groups-denied error; otherwise max(write, read). */
    def getPermissions(user: UserInfo, index: String): Permission = {
      if (isAdmin(user.groups)) return PermAdmin
      if (user.groups.isEmpty)
        throw new AuthError("user is not part of any groups in identity provider")
      var canRead = false; var canWrite = false
      val denied = Seq.newBuilder[String]
      var deniedN = 0
      user.groups.foreach { g =>
        permissions.get(g.groupId) match {
          case Some(byIndex) => byIndex.get(index) match {
            // exactly write/read — the reference keys allPermissions on
            // those two only (`authorization.go:65-68,90-96`), so an
            // 'admin'-valued per-index file entry grants NOTHING here
            case Some(p) => if (p == PermWrite) canWrite = true
                            else if (p == PermRead) canRead = true
            case None => throw new AuthError(
              s"user ${user.userId} does not have permission to index $index")
          }
          case None => denied += g.groupId; deniedN += 1
        }
      }
      if (deniedN == user.groups.length)
        throw new AuthError(
          s"group(s) ${denied.result().mkString("[", " ", "]")} does not have permission to FeatureBase")
      if (canWrite) PermWrite
      else if (canRead) PermRead
      else throw new AuthError("no permissions found")
    }

    /** `authorization.go:109-130` GetAuthorizedIndexList. */
    def authorizedIndexes(groups: Seq[Group], desired: Permission): Seq[String] =
      if (isAdmin(groups))
        permissions.valuesIterator.flatMap(_.keysIterator).toSeq.distinct
      else groups.flatMap(g =>
        permissions.getOrElse(g.groupId, Map.empty).collect {
          case (index, p) if p.satisfies(desired) => index
        }).distinct
  }

  object GroupPermissions {
    /** Parse the reference's permissions-file YAML
      * (`authorization.go:44-57` ReadPermissionsFile; format
      * `user-groups: {groupId: {index: perm}}` + `admin: groupId`). */
    def fromYaml(yaml: String): GroupPermissions = {
      val root = new org.yaml.snakeyaml.Yaml()
        .load[java.util.Map[String, Any]](yaml)
      if (root == null) throw new AuthError("empty permissions file")
      val groupsNode = root.get("user-groups") match {
        case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]]
        case _ => throw new AuthError("permissions file missing user-groups")
      }
      val perms = groupsNode.asScala.toMap.map { case (gid, v) =>
        val byIndex = v match {
          case m: java.util.Map[_, _] =>
            m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
              .map { case (idx, p) => idx -> Permission.parse(String.valueOf(p)) }
          case _ => Map.empty[String, Permission]
        }
        gid -> byIndex
      }
      new GroupPermissions(perms, String.valueOf(root.getOrDefault("admin", "")))
    }
  }

  /** Facade-side check: authenticate the bearer token, then demand `required`
    * on `index` (`reference/http_handler.go:733-849` chkAuthZ). Admin-level
    * routes pass a `None` index (cluster-wide). Returns the authenticated
    * user for query logging. */
  final case class Config(verifier: TokenVerifier, perms: GroupPermissions)

  def chkAuthZ(cfg: Config, bearer: Option[String], index: Option[String],
               required: Permission): UserInfo = {
    val token = bearer.getOrElse(throw new AuthError("auth token is empty"))
    val user = cfg.verifier.authenticate(token)
    if (cfg.perms.isAdmin(user.groups)) return user // http_handler.go:822-825
    if (required == PermAdmin)
      throw new AuthError(
        "Insufficient permissions: user does not have admin permission")
    index.foreach { idx =>
      val have = cfg.perms.getPermissions(user, idx)
      if (!have.satisfies(required))
        throw new AuthError(
          s"Insufficient permissions: user does not have $required permission to index $idx")
    }
    user
  }
}
