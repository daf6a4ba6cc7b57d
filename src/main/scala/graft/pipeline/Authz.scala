package graft.pipeline

import scala.collection.mutable

/** Authorization predicates — the reference's `_can_create` / `_can_read`
  * (etl-job/fhir_import_export.py:62-102 create, :105-145 read).
  *
  * The reference's rule is strict and conjunctive:
  *  - the user's `resources` list must contain BOTH `/programs/<program>`
  *    AND `/programs/<program>/projects` (:77-85 / :120-128), and
  *  - the user's `authz` map must carry the project path
  *    `/programs/<program>/projects/<project>` with the EXACT grant
  *    `{"method": "create"|"read-storage", "service": "*"}` (:87-100 /
  *    :130-143) — no wildcard method, no non-`*` service.
  * Every check appends a reference-shaped log line (the reference threads
  * an `output['logs']` list through the predicates).
  *
  * Pure driver-side functions (the reference checks an in-memory user
  * profile); set-membership at dataset scale is the `semi_anti` query.
  */
object Authz {

  /** One authz grant, e.g. ("create", "*") or ("read-storage", "fence"). */
  final case class Grant(method: String, service: String)

  /** The arborist `/user` payload shape the reference consumes
    * (fhir_import_export.py:44-46): visible resource paths + per-path
    * grants. */
  final case class UserProfile(email: String,
                               resources: Set[String],
                               authz: Map[String, Seq[Grant]])

  /** Shared create/read rule; `method` is the exact required method. */
  private def check(user: UserProfile, program: String, project: String,
                    method: String, logs: mutable.Buffer[String]): Boolean = {
    var ok = true
    Seq(s"/programs/$program", s"/programs/$program/projects").foreach { r =>
      if (!user.resources.contains(r)) {
        logs += s"$r not found in user resources"; ok = false
      } else logs += s"HAS RESOURCE $r"
    }
    val svc = s"/programs/$program/projects/$project"
    user.authz.get(svc) match {
      case None =>
        logs += s"$svc not found in user authz"; ok = false
      case Some(grants) =>
        // exact-grant membership, like the reference's dict-in-list test
        if (!grants.contains(Grant(method, "*"))) {
          logs += s"$method not found in user authz for $svc"; ok = false
        } else logs += s"HAS SERVICE $method on resource $svc"
    }
    ok
  }

  /** Create/write access (:62-102). */
  def canCreate(user: UserProfile, program: String, project: String,
                logs: mutable.Buffer[String] = mutable.Buffer.empty): Boolean =
    check(user, program, project, "create", logs)

  /** Read-storage access (:105-145). */
  def canRead(user: UserProfile, program: String, project: String,
              logs: mutable.Buffer[String] = mutable.Buffer.empty): Boolean =
    check(user, program, project, "read-storage", logs)

  /** `project_id` must be `<program>-<project>` (reference asserts and
    * splits on '-', :55-59). STRICT two-part unpack, matching the
    * reference's `program, project = project_id.split('-')` EXACTLY: a
    * second dash raises there (too many values to unpack), so `a-b-c`
    * is rejected here too rather than generalized to (a, b-c) — while
    * empty parts are ACCEPTED, because Python's `'prog-'.split('-')`
    * yields `['prog', '']` and unpacks fine (ADVICE r7: the earlier
    * nonEmpty check was stricter than the reference). */
  def splitProjectId(projectId: String): (String, String) = {
    val parts = projectId.split("-", -1)
    require(parts.length == 2,
      s"project_id must be <program>-<project> (exactly one '-'), " +
      s"got '$projectId'")
    (parts(0), parts(1))
  }

  /** Parse an arborist-shaped profile JSON:
    * {"email":"u@x","resources":["/programs/p", ...],
    *  "authz":{"/programs/p/projects/q":[{"method":"create","service":"*"}]}}
    */
  def parseProfile(json: String): UserProfile = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val resources = root.path("resources").elements().asScala
      .map(_.asText()).toSet
    val authz = root.path("authz").properties().asScala.map { e =>
      e.getKey -> e.getValue.elements().asScala.map { g =>
        Grant(g.path("method").asText(), g.path("service").asText())
      }.toSeq
    }.toMap
    UserProfile(root.path("email").asText(), resources, authz)
  }
}
