package graft.catalog

/** The Glue sync client over the in-process wire twin — Glue SEMANTICS
  * live in [[GlueCatalogSyncClient]] (shared, unchanged, with a real
  * `software.amazon.awssdk.services.glue` adapter behind [[GlueApi]] in
  * production); this class just binds the in-memory wire and exposes
  * the version history for assertions.
  */
class InMemoryGlueCatalogClient private (wire: InMemoryGlueApi,
    name: String, maxVersions: Int)
  extends GlueCatalogSyncClient(wire, name, maxVersions) {

  def this(catalogName: String = "glue", maxVersions: Int = 5) =
    this(new InMemoryGlueApi, catalogName, maxVersions)

  /** All retained versions, newest first — the Glue version history. */
  def tableVersions(id: CatalogTableIdentifier): Seq[CatalogTableDef] =
    wire.versionInputs(id.normalized.database, id.normalized.table)
      .map(toDef(id, _))
}
