package graft.sync

/**
 * Catalog plug-in point: resolves a named table to its filesystem
 * location and gives the sync run a catalog identity to persist on its
 * targets. The reference reflection-loads a `catalogImpl` class named
 * in config (ref `core/.../iceberg/IcebergCatalogConfig.java`,
 * `IcebergTableManager.java:48-122`, `utilities/.../RunSync.java:136-140`);
 * this is the same seam with a path-rooted warehouse as the default
 * implementation (an external catalog *service* client has no offline
 * parity — the documented constraint, not a missing feature).
 *
 * Implementations declare a public `(Map[String, String])` constructor
 * receiving every key of the YAML `catalog:` section verbatim, so a
 * plug-in defines its own configuration vocabulary without parser
 * changes.
 */
trait GraftCatalog {

  /** Catalog identity persisted on synced targets
    * (`graft.catalog.name`). */
  def name: String

  /** Filesystem location for the `format` variant of
    * `namespace.tableName`. */
  def locate(namespace: Option[String], tableName: String, format: String): String
}

/** Default catalog: tables live at `<warehouse>/<ns-path>/<name>_<fmt>`
  * (namespace dots become path segments) — the HadoopTables-style
  * layout. Needs `warehouse`; `name` defaults to `graft`. */
final class WarehouseCatalog(props: Map[String, String]) extends GraftCatalog {
  require(props.contains("warehouse"), "warehouse catalog needs `warehouse`")
  private val warehouse = props("warehouse").stripSuffix("/")
  val name: String = props.getOrElse("name", "graft")

  def locate(namespace: Option[String], tableName: String, format: String): String = {
    val ns = namespace.map(_.split("\\.").mkString("/") + "/").getOrElse("")
    s"$warehouse/$ns${tableName}_$format"
  }
}

object GraftCatalog {

  /** Load the implementation named by `impl` (default
    * [[WarehouseCatalog]]) with the full property map. Fails fast with
    * the class named when it is missing, not a [[GraftCatalog]], or has
    * no `(Map[String, String])` constructor. */
  def load(props: Map[String, String]): GraftCatalog = {
    val implName = props.getOrElse("impl", classOf[WarehouseCatalog].getName)
    val cls =
      try Class.forName(implName)
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalArgumentException(s"catalog impl not on classpath: $implName")
      }
    require(classOf[GraftCatalog].isAssignableFrom(cls),
      s"catalog impl $implName does not implement graft.sync.GraftCatalog")
    val ctor =
      try cls.getConstructor(classOf[Map[_, _]])
      catch {
        case _: NoSuchMethodException => throw new IllegalArgumentException(
          s"catalog impl $implName needs a (Map[String, String]) constructor")
      }
    ctor.newInstance(props).asInstanceOf[GraftCatalog]
  }
}
