package graft.storage

import java.nio.file.Paths

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** The user-facing storage opener (reference
  * `storages/_storage_instance_manager.py` + `storages/_base.py.open`):
  * `open*` resolves (id | name | alias) to a cached client instance of the
  * selected backend family, with the reference's rules —
  *
  *   - at most ONE of id/name/alias (`raise_if_too_many_kwargs`, `:118`);
  *   - no selector → the reserved run-scope alias `__default__` (`:120-122`);
  *   - `name` is global scope (persists across runs, never implicitly
  *     purged); `alias` is run scope; the two namespaces must not collide
  *     (`_check_name_alias_conflict`, `:238-256`);
  *   - names match `[a-zA-Z0-9]([a-zA-Z0-9-]*[a-zA-Z0-9])?` and may not be
  *     `__default__`; aliases may not be empty, contain path separators /
  *     null bytes, or be `.`/`..` (`storages/_utils.py`);
  *   - repeated opens of the same selector return the SAME instance
  *     (cache by (kind, selector); `open_storage_instance`, `:83-133`);
  *     opening by id resolves only instances this manager already created
  *     (local backends have no global id registry — documented; the
  *     reference consults its client cache the same way first).
  *
  * `backend` picks the storage-client family (S11): "memory", "fs", "sql"
  * (embedded Derby) or "spark" (FrontierStore event log / parquet
  * ResultDataset / snapshot KeyValueStore — the distributed family).
  * On-disk layout follows the reference:
  * `{root}/{request_queues|datasets|key_value_stores}/{name-or-alias}`.
  */
final class Storages(
    spark: SparkSession,
    root: String,
    backend: String = "spark"
) {
  require(Set("memory", "fs", "sql", "spark").contains(backend), s"unknown backend: $backend")

  private val DefaultAlias = "__default__"
  private val NameRegex = "^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9-]*[a-zA-Z0-9])$".r

  // cache: (kind, "name:"|"alias:" + key) -> instance; plus an id index
  private val cache = mutable.HashMap.empty[(String, String), AnyRef]
  private val byId = mutable.HashMap.empty[(String, String), AnyRef]
  private val namedKeys = mutable.HashMap.empty[String, mutable.Set[String]]
  private val aliasKeys = mutable.HashMap.empty[String, mutable.Set[String]]

  private def validate(name: Option[String], alias: Option[String], id: Option[String]): String = {
    val given = Seq(id, name, alias).count(_.isDefined)
    require(given <= 1, "Only one of id, name and alias can be specified")
    name.foreach { n =>
      require(n != DefaultAlias, s"""Storage name cannot be "$DefaultAlias" as it is reserved for default alias.""")
      require(NameRegex.matches(n),
        s"""Invalid storage name "$n". Name can only contain letters, digits and mid-string hyphens.""")
    }
    alias.foreach { a =>
      require(
        a.nonEmpty && !a.contains("/") && !a.contains("\\") && !a.contains("\u0000") && a != "." && a != "..",
        s"""Invalid storage alias "$a".""")
    }
    if (given == 0) s"alias:$DefaultAlias"
    else id.map(i => s"id:$i")
      .orElse(name.map(n => s"name:$n"))
      .getOrElse(s"alias:${alias.get}")
  }

  private def open[T <: AnyRef](
      kind: String,
      name: Option[String],
      alias: Option[String],
      id: Option[String]
  )(create: (String, Option[String]) => T): T = synchronized {
    val key = validate(name, alias, id)
    if (key.startsWith("id:")) {
      return byId.getOrElse((kind, key.drop(3)),
        throw new IllegalArgumentException(s"$kind with id ${key.drop(3)} not found")).asInstanceOf[T]
    }
    // name/alias namespaces must not collide (reference :238-256)
    val bare = key.dropWhile(_ != ':').drop(1)
    if (key.startsWith("name:") && aliasKeys.getOrElse(kind, mutable.Set.empty).contains(bare))
      throw new IllegalArgumentException(
        s"""Cannot create named storage "$bare" because an alias storage with the same name already exists.""")
    if (key.startsWith("alias:") && namedKeys.getOrElse(kind, mutable.Set.empty).contains(bare))
      throw new IllegalArgumentException(
        s"""Cannot create alias storage "$bare" because a named storage with the same name already exists.""")

    cache.getOrElseUpdate((kind, key), {
      val dir = Paths.get(root, kind, bare).toString
      val instance = create(dir, name)
      if (key.startsWith("name:")) namedKeys.getOrElseUpdate(kind, mutable.Set.empty) += bare
      else aliasKeys.getOrElseUpdate(kind, mutable.Set.empty) += bare
      instance
    }).asInstanceOf[T]
  }

  private def index(kind: String, id: String, instance: AnyRef): Unit =
    byId.getOrElseUpdate((kind, id), instance)

  def openRequestQueue(
      name: Option[String] = None,
      alias: Option[String] = None,
      id: Option[String] = None
  ): graft.queue.RequestQueueClient = {
    val c = open[graft.queue.RequestQueueClient]("request_queues", name, alias, id) { (dir, nm) =>
      backend match {
        case "memory" => new graft.queue.MemoryRequestQueueClient(nm)
        case "fs" => new graft.queue.FileSystemRequestQueueClient(dir, nm)
        case "sql" => new graft.queue.SqlRequestQueueClient(s"$dir/db", nm)
        case "spark" =>
          new graft.queue.FrontierQueueClient(new graft.queue.FrontierStore(spark, dir, name = nm))
      }
    }
    index("request_queues", c.id, c)
    c
  }

  def openDataset(
      name: Option[String] = None,
      alias: Option[String] = None,
      id: Option[String] = None
  ): DatasetClient = {
    val c = open[DatasetClient]("datasets", name, alias, id) { (dir, nm) =>
      backend match {
        case "memory" => new MemoryDatasetClient(nm)
        case "fs" => new FileSystemDatasetClient(dir, nm)
        case "sql" => new SqlDatasetClient(s"$dir/db", nm)
        case "spark" => new SparkDatasetClient(spark, new ResultDataset(spark, dir), nm)
      }
    }
    index("datasets", c.id, c)
    c
  }

  def openKeyValueStore(
      name: Option[String] = None,
      alias: Option[String] = None,
      id: Option[String] = None
  ): KeyValueStoreClient = {
    val c = open[KeyValueStoreClient]("key_value_stores", name, alias, id) { (dir, nm) =>
      backend match {
        case "memory" => new MemoryKeyValueStoreClient(nm)
        case "fs" => new FileSystemKeyValueStoreClient(dir, nm)
        case "sql" => new SqlKeyValueStoreClient(s"$dir/db", nm)
        case "spark" => new SnapshotKeyValueStoreClient(new KeyValueStore(spark, dir), nm)
      }
    }
    index("key_value_stores", c.id, c)
    c
  }
}
