package graft.pipeline

/** Authorization predicates — the reference's `_can_create` / `_can_read`
  * (etl-job/fhir_import_export.py:62-102 create, :105-145 read): a user
  * may write a project iff their resource list contains the program (or
  * program/project) path with a matching authz method grant; may read iff
  * granted `read-storage` on the project path.
  *
  * Pure driver-side functions (the reference checks an in-memory user
  * profile); set-membership at dataset scale is the `semi_anti` query.
  */
object Authz {

  /** One authz grant, e.g. ("create", "*") or ("read-storage", "fence"). */
  final case class Grant(method: String, service: String)

  /** user: resource path -> grants (the arborist /user payload shape). */
  type UserAuthz = Map[String, Seq[Grant]]

  private def allows(grants: Seq[Grant], method: String): Boolean =
    grants.exists(g =>
      (g.method == method || g.method == "*") &&
      (g.service == "*" || g.service.nonEmpty))

  /** Create/write access: program-level or project-level resource path
    * must carry a create grant (reference requires `/programs/<program>`
    * or `/programs/<program>/projects/<project>`, :77-100). */
  def canCreate(authz: UserAuthz, program: String, project: String): Boolean =
    Seq(s"/programs/$program",
        s"/programs/$program/projects/$project")
      .exists(r => authz.get(r).exists(allows(_, "create")))

  /** Read-storage access on the project path (:120-143). */
  def canRead(authz: UserAuthz, program: String, project: String): Boolean =
    Seq(s"/programs/$program/projects/$project",
        s"/programs/$program")
      .exists(r => authz.get(r).exists(allows(_, "read-storage")))

  /** `project_id` must be `<program>-<project>` (reference asserts and
    * splits on '-', :55-59). */
  def splitProjectId(projectId: String): (String, String) = {
    val i = projectId.indexOf('-')
    require(i > 0 && i < projectId.length - 1,
      s"project_id must be <program>-<project>, got '$projectId'")
    (projectId.substring(0, i), projectId.substring(i + 1))
  }
}
